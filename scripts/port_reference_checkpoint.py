"""Port a REFERENCE .pt checkpoint into a native framework checkpoint.

Takes the torch checkpoint the reference trainer writes
(reference train.py:118-162: a dict with 'model_state'/'model_best_state',
'vocab', 'args', 'counters'), converts the complete generator state_dict
through ``scene_generation_tpu.convert.convert_reference_state_dict``
(full-forward parity pinned by tests/test_model_port_golden.py), and saves
a framework checkpoint + meta that ``InferenceModel.from_checkpoint`` /
scripts/sample_images.py / the GUI server load directly.

The three discriminators are ported too when their states are present
(d_obj_state / d_img_state / d_mask_state; per-module goldens in
tests/test_discriminator_port_golden.py), so adversarial training can
resume against the reference's trained critics. Optimizer moments are NOT
ported (fresh Adam state; the reference's torch.optim.Adam moments do not
map onto optax trees 1:1 and a few warmup steps re-estimate them).

Usage:
  python scripts/port_reference_checkpoint.py \
      --torch_checkpoint /path/to/checkpoint_with_model.pt \
      --output_dir runs/ported [--best] [--compute_dtype bfloat16]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def config_from_reference_args(ref_args: dict, vocab: dict,
                               compute_dtype: str):
    """Map the reference args dict (train.py checkpoint['args']) onto a
    framework Config. Reference-parity bits are forced: torch_deconv
    (ConvTranspose2d bit-match), one-hot layout channels, terminal-ReLU
    box head."""
    from scene_generation_tpu.config import (Config, DataConfig,
                                             DiscriminatorConfig, LossConfig,
                                             ModelConfig, TrainConfig)

    def get(key, default):
        return ref_args.get(key, default) if ref_args else default

    size = tuple(get("image_size", (128, 128)))
    num_objs = len(vocab["object_to_idx"])
    num_preds = len(vocab["pred_idx_to_name"])
    model = ModelConfig(
        image_size=size,
        mask_size=get("mask_size", 32),
        num_objs=num_objs,
        num_preds=num_preds,
        num_attributes=vocab.get("num_attributes", 35),
        use_attributes=bool(get("use_attributes", True)),
        embedding_dim=get("embedding_dim", 128),
        gconv_dim=get("gconv_dim", 128),
        gconv_hidden_dim=get("gconv_hidden_dim", 512),
        gconv_num_layers=get("gconv_num_layers", 5),
        mlp_normalization=get("mlp_normalization", "none"),
        appearance_normalization=get("appearance_normalization", "batch"),
        activation=get("activation", "leakyrelu-0.2"),
        n_downsample_global=get("n_downsample_global", 4),
        box_dim=get("box_dim", 128),
        mask_noise_dim=get("mask_noise_dim", 64),
        rep_size=get("rep_size", 32),
        output_nc=get("output_nc", 3),
        compute_dtype=compute_dtype,
        # Reference parity, non-negotiable for ported weights:
        torch_deconv=True, layout_embed_dim=0, box_net_final="relu")
    if model.num_attributes != DataConfig().num_attributes:
        print(f"WARNING: checkpoint num_attributes={model.num_attributes} "
              f"differs from the data pipeline's "
              f"{DataConfig().num_attributes} (10 size bins + 5x5 grid); "
              "eval batches must provide matching attribute widths")
    disc = DiscriminatorConfig(
        ndf=get("ndf", 64), num_d=get("num_D", 2),
        n_layers_d=get("n_layers_D", 3), norm_d=get("norm_D", "instance"),
        ndf_mask=get("ndf_mask", 64), num_d_mask=get("num_D_mask", 1),
        norm_d_mask=get("norm_D_mask", "instance"),
        n_layers_d_mask=get("n_layers_D_mask", 2),
        no_lsgan=bool(get("no_lsgan", False)),
        d_obj_arch=get("d_obj_arch", "C4-64-2,C4-128-2,C4-256-2"),
        d_normalization=get("d_normalization", "batch"),
        d_padding=get("d_padding", "valid"),
        d_activation=get("d_activation", "leakyrelu-0.2"),
        crop_size=get("crop_size", 32))
    return Config(
        data=DataConfig(image_size=size, mask_size=model.mask_size,
                        batch_size=int(get("batch_size", 12))),
        model=model, discriminator=disc, loss=LossConfig(),
        train=TrainConfig(output_dir="", checkpoint_name="checkpoint"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_checkpoint", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--checkpoint_name", default="checkpoint")
    ap.add_argument("--best", action="store_true",
                    help="port model_best_state instead of model_state")
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="serving dtype for the ported config (params are "
                         "stored f32 either way)")
    a = ap.parse_args(argv)

    import torch

    ckpt = torch.load(a.torch_checkpoint, map_location="cpu",
                      weights_only=False)
    key = "model_best_state" if a.best else "model_state"
    if ckpt.get(key) is None:
        raise SystemExit(f"checkpoint has no '{key}'")
    state_dict = ckpt[key]
    vocab = ckpt["vocab"]
    ref_args = ckpt.get("args") or {}

    cfg = config_from_reference_args(ref_args, vocab, a.compute_dtype)

    from scene_generation_tpu.convert import convert_reference_state_dict
    converted = convert_reference_state_dict(state_dict, cfg.model)

    # Template state (fresh D's/optimizers), then swap the generator.
    import jax
    import jax.numpy as jnp
    from flax.core import FrozenDict
    from scene_generation_tpu.data.synthetic import synthetic_batch
    from scene_generation_tpu.trainer.train_state import create_train_state
    from scene_generation_tpu.trainer.checkpoint import CheckpointManager

    batch = synthetic_batch(cfg, seed=0, batch_size=1)
    _, template = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                     load_vgg=False)
    as_f32 = lambda tree: jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32), tree)
    state = template.replace(g_params=as_f32(converted["params"]),
                             g_stats=FrozenDict(
                                 as_f32(converted["batch_stats"])))

    from scene_generation_tpu.convert import (convert_reference_d_obj,
                                              convert_reference_multiscale_d)
    dc = cfg.discriminator
    if ckpt.get("d_obj_state"):
        d = convert_reference_d_obj(ckpt["d_obj_state"],
                                    arch=dc.d_obj_arch,
                                    normalization=dc.d_normalization)
        state = state.replace(d_obj_params=as_f32(d["params"]),
                              d_obj_stats=FrozenDict(
                                  as_f32(d["batch_stats"])))
        print("ported d_obj_state")
    if ckpt.get("d_img_state"):
        d = convert_reference_multiscale_d(ckpt["d_img_state"],
                                           num_d=dc.num_d,
                                           n_layers=dc.n_layers_d)
        state = state.replace(d_img_params=as_f32(d["params"]))
        print("ported d_img_state")
    if ckpt.get("d_mask_state"):
        d = convert_reference_multiscale_d(ckpt["d_mask_state"],
                                           num_d=dc.num_d_mask,
                                           n_layers=dc.n_layers_d_mask)
        state = state.replace(d_mask_params=as_f32(d["params"]))
        print("ported d_mask_state")

    ckpt_mgr = CheckpointManager(a.output_dir, a.checkpoint_name,
                                 use_async=False)
    meta = ckpt_mgr.new_meta(cfg, vocab)
    counters = ckpt.get("counters") or {}
    meta["counters"] = {"t": int(counters.get("t") or 0),
                        "epoch": int(counters.get("epoch") or 0)}
    meta["ported_from"] = os.path.abspath(a.torch_checkpoint)
    ckpt_mgr.save(state, best=False)
    ckpt_mgr.save_meta(meta)
    ckpt_mgr.wait()
    print(f"ported '{key}' ({sum(v.numel() for v in state_dict.values())} "
          f"reference params) -> {ckpt_mgr.root}")


if __name__ == "__main__":
    main()
