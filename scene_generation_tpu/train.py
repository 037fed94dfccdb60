"""Training CLI (reference ``train.py:166-231``).

Usage:
  python -m scene_generation_tpu.train --synthetic --num_iterations 100
  python -m scene_generation_tpu.train --coco_dir datasets/coco ...

Flow: build loaders -> init/restore state -> jitted adversarial step over a
data-parallel mesh -> periodic loss/image logging -> periodic check_model
(IoU + IS) -> checkpoint with best-state promotion.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

# Persistent compile cache: the full train step is a 10-20 min remote
# compile on a cold tunnel; caching makes restarts/resumes (and the
# post-crash re-run this module's SIGTERM handler enables) near-instant.
# Env wins if the caller set a different dir; scripts/eval_run.py sets
# the same path for its child stages.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

from scene_generation_tpu.config import (Config, DataConfig, LossConfig,
                                         ModelConfig, TrainConfig, tiny_config)
from scene_generation_tpu.data.loader import DataLoader, device_prefetch
from scene_generation_tpu.data.synthetic import SyntheticDataset
from scene_generation_tpu.parallel import create_mesh, replicate_state
from scene_generation_tpu.trainer.checkpoint import CheckpointManager
from scene_generation_tpu.trainer.evaluation import check_model
from scene_generation_tpu.trainer.step import make_train_step
from scene_generation_tpu.trainer.train_state import create_train_state


def parse_args(argv=None) -> argparse.Namespace:
    # --preset rewires flag DEFAULTS only (two-stage parse): any flag given
    # explicitly on the command line still wins.
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--preset", choices=["parity", "quality", "throughput"],
                     default="parity")
    preset = pre.parse_known_args(argv)[0].preset

    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["parity", "quality", "throughput"],
                   default="parity",
                   help="'parity' (default): the reference's exact flag "
                        "defaults, including its documented quality "
                        "foot-guns (terminal-ReLU box head one dead-ReLU "
                        "event from collapse, use_gt-gated box loss that "
                        "fails scene-graph-only sampling — RESULTS.md). "
                        "'quality': the validated r3_final/r4_repl "
                        "configuration every quality claim in RESULTS.md "
                        "rests on: box_net_final=none, box_loss_gated=0, "
                        "compute_dtype=bfloat16, synthetic_size=4096, "
                        "plus bf16 Adam mu (validated by the r5_b24 run, "
                        "RESULTS §39). "
                        "'throughput': quality + the runs/r5_b24 scaled "
                        "training point (batch 24, lr sqrt-scaled, bf16 "
                        "Adam mu — RESULTS §36/§39). "
                        "Explicit flags override the preset.")
    # Optimization (args.py:13-16).
    # None = config default (12 full / 4 tiny); an explicit value wins in
    # BOTH modes (multi-host tests size the global batch to the mesh).
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_iterations", type=int, default=1_000_000)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--mask_learning_rate", type=float, default=1e-5)
    # Dataset (args.py:18-47).
    p.add_argument("--image_size", type=str, default="128,128")
    p.add_argument("--num_train_samples", type=int, default=None)
    p.add_argument("--num_val_samples", type=int, default=1024)
    p.add_argument("--coco_dir", type=str, default="datasets/coco")
    p.add_argument("--synthetic", action="store_true",
                   help="procedural dataset; no COCO files needed")
    p.add_argument("--is_panoptic", type=int, default=0)
    p.add_argument("--synthetic_size", type=int, default=512)
    p.add_argument("--tiny", action="store_true",
                   help="tiny architecture (CI/smoke)")
    # Generator (args.py:49-68).
    p.add_argument("--mask_size", type=int, default=32)
    p.add_argument("--embedding_dim", type=int, default=128)
    p.add_argument("--gconv_dim", type=int, default=128)
    p.add_argument("--gconv_num_layers", type=int, default=5)
    p.add_argument("--n_downsample_global", type=int, default=4)
    p.add_argument("--use_attributes", type=int, default=1)
    p.add_argument("--compute_dtype",
                   choices=["float32", "bfloat16", "float16"],
                   default="float32",
                   help="generator/model conv+matmul compute dtype; "
                        "params, optimizer math, loss reductions and norm "
                        "stats stay f32; discriminators/VGG are bf16 "
                        "regardless (DiscConfig). Loss curves track f32 "
                        "within noise (RESULTS.md section 8)")
    p.add_argument("--layout_embed_dim", type=int, default=0,
                   help="0 (reference parity): one-hot layout class "
                        "channels; >0: composite a learned class "
                        "embedding of this dim instead — cuts the "
                        "generator stem cost ~(num_objs/dim)x "
                        "(config.py ModelConfig.layout_embed_dim)")
    p.add_argument("--box_net_final", choices=["relu", "none"],
                   default="relu",
                   help="terminal box-head nonlinearity; 'relu' is "
                        "reference parity but can dead-ReLU collapse "
                        "(config.py ModelConfig.box_net_final)")
    p.add_argument("--scan_blocks", type=int, default=0,
                   help="1 = nn.scan the 9 generator resblocks (compiles "
                        "the block body once; the safe choice on flaky "
                        "cold-cache remote compilers). 0 (default) = "
                        "unrolled: XLA fuses across block boundaries — "
                        "measured 50.2 vs 61.2 ms/step bf16 at batch 12 "
                        "(+22%% training throughput, RESULTS train-decomp "
                        "section) for ~1 extra compile minute per run. "
                        "Recorded in checkpoint meta, so restores/serving "
                        "rebuild the matching param tree.")
    p.add_argument("--torch_deconv", type=int, default=0,
                   help="1 = exact torch ConvTranspose2d(3,2,1,op=1) "
                        "upsampling (for reference-weight ports); 0 = "
                        "flax SAME variant all committed checkpoints use "
                        "(config.py ModelConfig.torch_deconv)")
    # Loss weights (args.py:70-79).
    p.add_argument("--box_loss_gated", type=int, default=1,
                   help="1 (reference parity): box MSE only on use_gt "
                        "steps; 0: supervise boxes every step so the "
                        "no-attribute path doesn't decay (RESULTS.md)")
    p.add_argument("--l1_pixel_loss_weight", type=float, default=0.0)
    p.add_argument("--bbox_pred_loss_weight", type=float, default=10.0)
    p.add_argument("--vgg_features_weight", type=float, default=10.0)
    p.add_argument("--d_img_weight", type=float, default=1.0)
    p.add_argument("--d_img_features_weight", type=float, default=10.0)
    p.add_argument("--d_mask_weight", type=float, default=1.0)
    p.add_argument("--d_mask_features_weight", type=float, default=10.0)
    p.add_argument("--d_obj_weight", type=float, default=0.1)
    p.add_argument("--ac_loss_weight", type=float, default=0.1)
    p.add_argument("--gan_loss_type", type=str, default="gan")
    # Output (args.py:102-109).
    p.add_argument("--print_every", type=int, default=100)
    p.add_argument("--checkpoint_every", type=int, default=10000)
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--checkpoint_name", type=str, default="checkpoint")
    p.add_argument("--restore_from_checkpoint", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--adam_mu_dtype", choices=["", "bfloat16"], default="",
                   help="Adam first-moment storage dtype; '' = f32 "
                        "(reference parity). bfloat16 removes HBM bytes "
                        "from the bandwidth-bound step (RESULTS §30)")
    p.add_argument("--adam_nu_dtype", choices=["", "float16", "bfloat16"],
                   default="",
                   help="Adam second-moment storage dtype; '' = f32 "
                        "(reference parity). bfloat16 FREEZES nu at "
                        "b2=0.999 (tests/test_optim.py) — exposed only "
                        "for the A/B record; float16 accumulates but "
                        "underflows for sustained |g|<~2e-4 "
                        "(trainer/optim.py)")
    p.add_argument("--grads_dtype", choices=["", "bfloat16"], default="",
                   help="gradient-tree storage dtype at the backward->"
                        "optimizer boundary; '' = f32 (reference parity). "
                        "bfloat16 halves grad-tree HBM materialization "
                        "(A/B in RESULTS §37); moment math stays f32")
    p.add_argument("--timing", action="store_true")
    # Tracing/profiling (SURVEY.md §5): capture a jax.profiler trace of
    # steps [profile_start, profile_start + profile_steps).
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--profile_start", type=int, default=10)
    p.add_argument("--profile_steps", type=int, default=5)
    # Multi-host: initialize jax.distributed before device discovery so the
    # mesh spans the slice (ICI) / slices (DCN).
    p.add_argument("--distributed", action="store_true")
    # Reference runs an initial check_model before training
    # (train.py:178-184); off by default here to keep smoke runs fast.
    p.add_argument("--initial_eval", type=int, default=0)
    # Inception score during check_model (random-init InceptionV3 unless a
    # torchvision checkpoint is available; see models/inception.py).
    p.add_argument("--eval_inception", action="store_true")
    # Force the CPU backend (same escape hatch as the eval scripts): for
    # smoke runs / CI boxes and when the remote-TPU relay is unavailable.
    p.add_argument("--cpu", action="store_true")
    if preset in ("quality", "throughput"):
        # The exact quality-relevant settings of runs/r3_final + r4_repl
        # (RESULTS §25/§34); scan_blocks stays at the round-4 unrolled
        # default (perf-only, +22% train throughput, meta-recorded).
        # adam_mu_dtype=bfloat16 was promoted into the production presets
        # after the runs/r5_b24 15k-step quality run passed with it ON
        # (RESULTS §39; bandwidth-exact −2.8% ms/step, §35). Parity keeps
        # f32 moments (reference trainer.py:60,80,106,133); opt out with
        # --adam_mu_dtype "".
        p.set_defaults(box_net_final="none", box_loss_gated=0,
                       compute_dtype="bfloat16", synthetic_size=4096,
                       adam_mu_dtype="bfloat16")
    if preset == "throughput":
        # The validated high-throughput configuration of runs/r5_b24
        # (RESULTS §36/§39): batch 24 (amortizes the per-step-constant
        # param/grad/moment HBM streams, +24% img/s over b12), lr
        # sqrt-scaled by 2x.
        p.set_defaults(batch_size=24, learning_rate=1.41e-4,
                       mask_learning_rate=1.41e-5)
    return p.parse_args(argv)


def config_from_args(a: argparse.Namespace) -> Config:
    if a.tiny:
        cfg = tiny_config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model,
                                      compute_dtype=a.compute_dtype,
                                      layout_embed_dim=a.layout_embed_dim,
                                      box_net_final=a.box_net_final,
                                      scan_blocks=bool(a.scan_blocks),
                                      torch_deconv=bool(a.torch_deconv)),
            loss=dataclasses.replace(cfg.loss,
                                     box_loss_gated=bool(a.box_loss_gated)))
        if a.batch_size is not None:
            cfg = cfg.replace(data=dataclasses.replace(
                cfg.data, batch_size=a.batch_size))
        return cfg.replace(train=dataclasses.replace(
            cfg.train, num_iterations=a.num_iterations,
            learning_rate=a.learning_rate,
            mask_learning_rate=a.mask_learning_rate,
            print_every=a.print_every, checkpoint_every=a.checkpoint_every,
            output_dir=a.output_dir, checkpoint_name=a.checkpoint_name,
            restore_from_checkpoint=bool(a.restore_from_checkpoint),
            seed=a.seed,
            adam_mu_dtype=a.adam_mu_dtype,
            adam_nu_dtype=a.adam_nu_dtype,
            grads_dtype=a.grads_dtype))
    size = tuple(int(x) for x in a.image_size.split(","))
    return Config(
        data=DataConfig(image_size=size, mask_size=a.mask_size,
                        batch_size=12 if a.batch_size is None
                        else a.batch_size,
                        num_train_samples=a.num_train_samples,
                        num_val_samples=a.num_val_samples,
                        coco_dir=a.coco_dir),
        model=ModelConfig(image_size=size, mask_size=a.mask_size,
                          embedding_dim=a.embedding_dim,
                          gconv_dim=a.gconv_dim,
                          gconv_num_layers=a.gconv_num_layers,
                          n_downsample_global=a.n_downsample_global,
                          use_attributes=bool(a.use_attributes),
                          compute_dtype=a.compute_dtype,
                          layout_embed_dim=a.layout_embed_dim,
                          box_net_final=a.box_net_final,
                          scan_blocks=bool(a.scan_blocks),
                          torch_deconv=bool(a.torch_deconv)),
        loss=LossConfig(
            l1_pixel_loss_weight=a.l1_pixel_loss_weight,
            bbox_pred_loss_weight=a.bbox_pred_loss_weight,
            vgg_features_weight=a.vgg_features_weight,
            d_img_weight=a.d_img_weight,
            d_img_features_weight=a.d_img_features_weight,
            d_mask_weight=a.d_mask_weight,
            d_mask_features_weight=a.d_mask_features_weight,
            d_obj_weight=a.d_obj_weight, ac_loss_weight=a.ac_loss_weight,
            box_loss_gated=bool(a.box_loss_gated)),
        train=TrainConfig(num_iterations=a.num_iterations,
                          learning_rate=a.learning_rate,
                          mask_learning_rate=a.mask_learning_rate,
                          print_every=a.print_every,
                          checkpoint_every=a.checkpoint_every,
                          output_dir=a.output_dir,
                          checkpoint_name=a.checkpoint_name,
                          restore_from_checkpoint=bool(
                              a.restore_from_checkpoint),
                          seed=a.seed,
                          adam_mu_dtype=a.adam_mu_dtype,
                          adam_nu_dtype=a.adam_nu_dtype,
                          grads_dtype=a.grads_dtype))


def build_datasets(cfg: Config, a: argparse.Namespace):
    if a.synthetic:
        train = SyntheticDataset(cfg, size=a.synthetic_size, seed=cfg.train.seed)
        val = SyntheticDataset(cfg, size=max(8, a.synthetic_size // 8),
                               seed=cfg.train.seed + 1)
        return train.vocab, train, val
    from scene_generation_tpu.data.coco import CocoSceneGraphDataset
    d = cfg.data
    common = dict(image_size=d.image_size, mask_size=d.mask_size,
                  min_object_size=d.min_object_size,
                  min_objects_per_image=d.min_objects_per_image,
                  max_objects_per_image=d.max_objects_per_image,
                  instance_whitelist=d.instance_whitelist,
                  stuff_whitelist=d.stuff_whitelist,
                  include_other=d.include_other)
    cdir = a.coco_dir
    if a.is_panoptic:
        from scene_generation_tpu.data.coco_panoptic import (
            CocoPanopticSceneGraphDataset)
        cats = os.path.join(cdir,
                            "annotations/panoptic_coco_categories.json")
        train = CocoPanopticSceneGraphDataset(
            image_dir=os.path.join(cdir, "images/train2017"),
            panoptic=os.path.join(
                cdir, "annotations/panoptic_train2017.json"),
            panoptic_segmentation=os.path.join(
                cdir, "panoptic/annotations/panoptic_train2017"),
            panoptic_categories=cats, max_samples=d.num_train_samples,
            seed=cfg.train.seed, **common)
        val = CocoPanopticSceneGraphDataset(
            image_dir=os.path.join(cdir, "images/val2017"),
            panoptic=os.path.join(cdir, "annotations/panoptic_val2017.json"),
            panoptic_segmentation=os.path.join(
                cdir, "panoptic/annotations/panoptic_val2017"),
            panoptic_categories=cats, max_samples=d.num_val_samples,
            seed=cfg.train.seed, **common)
        assert train.vocab["object_to_idx"] == val.vocab["object_to_idx"]
        return train.vocab, train, val
    train = CocoSceneGraphDataset(
        image_dir=os.path.join(cdir, "images/train2017"),
        instances_json=os.path.join(
            cdir, "annotations/instances_train2017.json"),
        stuff_json=os.path.join(cdir, "annotations/stuff_train2017.json"),
        max_samples=d.num_train_samples, seed=cfg.train.seed, **common)
    val = CocoSceneGraphDataset(
        image_dir=os.path.join(cdir, "images/val2017"),
        instances_json=os.path.join(
            cdir, "annotations/instances_val2017.json"),
        stuff_json=os.path.join(cdir, "annotations/stuff_val2017.json"),
        max_samples=d.num_val_samples, seed=cfg.train.seed, **common)
    assert train.vocab["object_to_idx"] == val.vocab["object_to_idx"]
    return train.vocab, train, val


def main(argv=None):
    a = parse_args(argv)
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    if a.distributed:
        jax.distributed.initialize()
    cfg = config_from_args(a)
    vocab, train_dset, val_dset = build_datasets(cfg, a)
    num_objs = len(vocab["object_to_idx"])
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, num_objs=num_objs))
    print(f"dataset: {len(train_dset)} train / {len(val_dset)} val images, "
          f"{num_objs} classes")

    # One writer of record: host-side artifacts (args/TB/checkpoints) come
    # from process 0; the train state is replicated so its copy is complete.
    is_primary = jax.process_index() == 0
    os.makedirs(cfg.train.output_dir, exist_ok=True)
    if is_primary:
        with open(os.path.join(cfg.train.output_dir, "args.json"), "w") as f:
            json.dump(vars(a), f)

    writer = None
    if is_primary:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(cfg.train.output_dir)
        except Exception:
            pass

    # Process workers for real datasets (JPEG decode + RLE rasterize compete
    # with the training process for the GIL; reference uses 4 worker
    # processes, train.py:71-77). Synthetic generation is cheap numpy —
    # threads avoid the spawn/pickle overhead.
    # Multi-host: every process computes the same global shuffle and loads
    # only its 1/process_count slice of each global batch; shard_batch /
    # device_prefetch assemble the global array from the local pieces.
    dl_kwargs = dict(batch_size=cfg.data.batch_size,
                     max_objs=cfg.data.max_objs,
                     max_triples=cfg.data.max_triples, num_workers=4,
                     worker_type="thread" if a.synthetic else "process",
                     process_count=jax.process_count(),
                     process_index=jax.process_index())
    train_loader = DataLoader(train_dset, shuffle=True,
                              seed=cfg.train.seed, **dl_kwargs)
    val_loader = DataLoader(val_dset, shuffle=cfg.data.shuffle_val,
                            seed=cfg.train.seed + 1, **dl_kwargs)

    rng = jax.random.PRNGKey(cfg.train.seed)
    init_batch = next(iter(train_loader))
    mods, state = create_train_state(cfg, rng, init_batch)

    ckpt = CheckpointManager(cfg.train.output_dir, cfg.train.checkpoint_name)
    meta = None
    if cfg.train.restore_from_checkpoint and ckpt.has_checkpoint():
        meta = ckpt.load_meta()
        state = ckpt.restore(state)
        print(f"restored checkpoint at t={meta['counters']['t']}")
    if meta is None:
        meta = ckpt.new_meta(cfg, vocab)

    # Largest device count that divides the global batch (single host);
    # multi-host meshes must span every device of every process.
    n_dev = len(jax.devices())
    if jax.process_count() > 1:
        if cfg.data.batch_size % n_dev:
            raise ValueError(
                f"--batch_size {cfg.data.batch_size} must be divisible by "
                f"the {n_dev} devices of a multi-host run")
    else:
        while cfg.data.batch_size % n_dev:
            n_dev -= 1
    mesh = create_mesh(n_dev)
    state = replicate_state(state, mesh)
    step_fn = make_train_step(mods)
    t = meta["counters"]["t"]
    epoch = meta["counters"]["epoch"]

    probs_fn = None
    inception_real = False
    if a.eval_inception:
        from scene_generation_tpu.models.inception import (
            create_inception_probs_fn)
        probs_fn, loaded = create_inception_probs_fn()
        inception_real = bool(loaded)
        if not loaded:
            print("WARNING: no InceptionV3 weights found; IS values are "
                  "relative-only (random-init classifier)")

    # Preemption safety (SURVEY.md §5 failure detection): checkpoint on
    # SIGTERM/SIGINT and exit cleanly; --restore_from_checkpoint 1 resumes.
    import signal
    stop_requested = {"flag": False}

    def _on_term(signum, frame):
        stop_requested["flag"] = True

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    from scene_generation_tpu.parallel import batch_sharding, shard_batch

    def eval_iter(loader):
        # check_model feeds host batches straight into a jitted step; on
        # >1 process the (process-local) batch must first be assembled
        # into a global array matching the replicated state's mesh.
        if jax.process_count() == 1:
            return iter(loader)
        return (shard_batch(b, mesh) for b in loader)

    # TB image panels only need ONE example; local_slice takes it from
    # the first locally-addressable shard — multi-host safe (eager global
    # indexing from process 0 alone would raise on >1 process).
    from scene_generation_tpu.parallel import local_slice as first_local

    if a.initial_eval:
        tr = check_model(mods, state, eval_iter(val_loader), use_gt=True,
                         num_samples=cfg.data.num_val_samples,
                         probs_fn=probs_fn)
        print(f"initial: val-gt iou {tr[0]:.4f} inception {tr[1]:.4f}")
        if writer:
            writer.add_scalar("checkpoint/val_gt_iou", tr[0], 0)
            writer.add_scalar("checkpoint/val_gt_inception_mean", tr[1], 0)

    print(f"training on {mesh.devices.size} device(s); "
          f"{cfg.train.num_iterations} iterations")

    t_start = time.time()
    timing_anchor = None  # (step, wall) of the previous print (--timing)

    # ONE device_prefetch spanning every epoch: tearing the prefetcher
    # down per epoch drained its buffer and restarted the feeder thread
    # at each boundary (~1.3s stall — measured ~30 ms/step amortized on a
    # 42-step synthetic epoch; RESULTS.md §24). The stream pins each
    # epoch's loader order to (seed, epoch) exactly as before; epoch_q
    # tracks which epoch each CONSUMED batch belongs to (the generator
    # runs ahead of consumption by the prefetch depth, so a plain
    # variable would drift around boundaries and corrupt the checkpoint
    # epoch counter used for deterministic resume).
    import collections
    epoch_q = collections.deque()

    def epoch_stream():
        e = epoch
        while True:
            e += 1
            # Data order is a pure function of (seed, epoch) — identical
            # across processes and across restarts.
            train_loader.set_epoch(e)
            for b in train_loader:
                epoch_q.append(e)
                yield b

    prefetched = device_prefetch(epoch_stream(), batch_sharding(mesh))
    while True:
        for batch in prefetched:
            if t >= cfg.train.num_iterations or stop_requested["flag"]:
                break
            t += 1
            epoch = epoch_q.popleft()
            if a.profile_dir and t == a.profile_start:
                jax.profiler.start_trace(a.profile_dir)
            state, metrics = step_fn(state, batch)
            if a.profile_dir and t == a.profile_start + a.profile_steps:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                print(f"profiler trace written to {a.profile_dir}")

            if t % cfg.train.print_every == 0 or t == 1:
                index = t // cfg.train.print_every
                # ONE device->host transfer for every logged scalar:
                # per-key float() readbacks each pay a full tunnel round
                # trip (~17 keys x ~30 ms measured ~0.5 s/print;
                # RESULTS.md §24).
                scalars = {k: float(v) for k, v in jax.device_get(
                    {k: v for k, v in metrics.items()
                     if not k.startswith("_")}).items()}
                # NaN gate: GAN training diverges silently otherwise. The
                # check rides the print_every readback (no extra sync). The
                # last *good* checkpoint is left untouched; the poisoned
                # state is dumped under a separate name for post-mortem.
                bad = [k for k, v in scalars.items() if not np.isfinite(v)]
                if bad:
                    print(f"FATAL: non-finite losses at t={t}: {bad}")
                    # The MAIN checkpoint (state + meta sidecar) is left
                    # entirely untouched so --restore_from_checkpoint
                    # resumes at the t matching the restored weights; the
                    # abort record rides the nan_abort manager's own meta.
                    nan_ckpt = CheckpointManager(
                        cfg.train.output_dir,
                        cfg.train.checkpoint_name + "_nan_abort")
                    nan_meta = dict(meta)
                    nan_meta["counters"] = {"t": t, "epoch": epoch}
                    nan_meta["nan_abort"] = {"t": t, "keys": bad}
                    nan_ckpt.save(state, best=False)
                    nan_ckpt.save_meta(nan_meta)
                    nan_ckpt.wait()
                    raise FloatingPointError(
                        f"non-finite losses at t={t}: {bad}; last good "
                        f"checkpoint preserved, poisoned state saved as "
                        f"{cfg.train.checkpoint_name}_nan_abort")
                now = time.time()
                rate = t / (now - t_start)
                print(f"t = {t} / {cfg.train.num_iterations} "
                      f"({rate:.2f} it/s)", flush=True)
                # --timing: SUSTAINED wall ms/step over the window since
                # the previous print (loader + host->device transfer +
                # device compute; the float() readbacks above drain the
                # dispatch queue, so the window is honestly synced). The
                # t=1 window is compile-polluted and skipped.
                if a.timing and t > 1 and timing_anchor is not None:
                    at, atime = timing_anchor
                    win = (now - atime) / (t - at)
                    print(f"  [timing] {win * 1e3:.1f} ms/step sustained "
                          f"over steps {at + 1}..{t}", flush=True)
                timing_anchor = (t, now)
                for name, val in sorted(scalars.items()):
                    print(f"  [{name}]: {val:.4f}")
                    meta["losses"].setdefault(name, []).append(val)
                    if writer:
                        writer.add_scalar(f"g_loss/{name}", val, index)
                meta["losses_ts"].append(t)
                if writer:
                    # Image grids (reference write_images,
                    # trainer.py:370-392); CHW uint8 for tensorboardX.
                    from scene_generation_tpu.data.image_utils import deprocess
                    from scene_generation_tpu.vis import one_hot_to_rgb_compact
                    real = deprocess(np.asarray(first_local(batch.imgs)[0]))
                    pred = deprocess(
                        np.asarray(first_local(metrics["_imgs_pred"])[0]))
                    writer.add_image("img/real", real.transpose(2, 0, 1),
                                     index)
                    writer.add_image("img/pred", pred.transpose(2, 0, 1),
                                     index)
                    if cfg.model.layout_embed_dim == 0:
                        # With a learned layout embedding the leading
                        # channels are signed embedding values, not class
                        # one-hots — argmax-to-RGB would be meaningless,
                        # so the layout panels are skipped.
                        # Palette projection happens on device; only the
                        # (1, H, W, 3) panels cross the wire.
                        lay = one_hot_to_rgb_compact(
                            first_local(metrics["_layout_one_hot"]))[0]
                        writer.add_image("img/layout",
                                         lay.transpose(2, 0, 1), index)
                        lay_p = one_hot_to_rgb_compact(
                            first_local(metrics["_layout_pred_one_hot"]))[0]
                        writer.add_image("img/layout_pred",
                                         lay_p.transpose(2, 0, 1), index)

            if t % cfg.train.checkpoint_every == 0:
                # Both sweeps run on the VAL loader, exactly as the
                # reference does (reference train.py:224-226 passes
                # val_loader for BOTH check_model calls) — its "train"
                # row is really the use_gt=True val sweep. We keep the
                # behavior but name the rows truthfully: val-gt
                # (GT layout + attributes) vs val-sg (scene graph only).
                print("checking on val (gt-layout + scene-graph-only)")
                tr = check_model(mods, state, eval_iter(val_loader), use_gt=True,
                                 num_samples=cfg.data.num_val_samples,
                                 probs_fn=probs_fn)
                va = check_model(mods, state, eval_iter(val_loader), use_gt=False,
                                 num_samples=cfg.data.num_val_samples,
                                 probs_fn=probs_fn)
                print(f"val-gt iou: {tr[0]:.4f}  val-sg iou: {va[0]:.4f}")
                meta["checkpoint_ts"].append(t)
                meta.setdefault("val_gt_inception", []).append(tr[1])
                meta["counters"] = {"t": t, "epoch": epoch}
                # Best-promotion metric: val-sg inception when REAL
                # Inception weights are loaded (the reference's rule,
                # trainer.py:188-197); otherwise val-sg IoU — without
                # weights the inception score is degenerate noise and
                # best/ would be a random checkpoint.
                if inception_real:
                    is_best = ckpt.maybe_promote_best(
                        meta, state, va[1], metric="val_inception")
                else:
                    is_best = ckpt.maybe_promote_best(
                        meta, state, va[0], metric="val_sg_iou")
                ckpt.save(state, best=False)
                ckpt.save_meta(meta)
                if writer:
                    writer.add_scalar("checkpoint/val_gt_iou", tr[0], t)
                    writer.add_scalar("checkpoint/val_sg_iou", va[0], t)
                print(f"saved checkpoint (best={is_best})")

        # The stream is infinite; the for exits only via its own break
        # (iteration budget reached or preemption) — one pass total.
        break

    meta["counters"] = {"t": t, "epoch": epoch}
    ckpt.save(state, best=False)
    ckpt.save_meta(meta)
    ckpt.wait()  # let the async writer land before exiting
    if stop_requested["flag"]:
        print(f"preempted: checkpointed at t={t}; resume with "
              f"--restore_from_checkpoint 1")
    else:
        print(f"done: {t} iterations in {time.time() - t_start:.1f}s")
    return state, meta


if __name__ == "__main__":
    main()
