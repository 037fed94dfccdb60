"""Training-step decomposition: per-segment device ms + train-MFU.

The training analog of scripts/serving_decomp.py (VERDICT r3 weak #1).
Times the FULL adversarial step and each of its segments as separately
jitted programs with the bench.py chained-dispatch harness (K=1 baseline
subtraction; block_until_ready is a no-op under the axon tunnel), at both
generator compute dtypes, and reports each compiled program's exact XLA
FLOP/byte counts (executable cost analysis) so the step's MFU and
arithmetic intensity are measured, not hand-counted.

Segments (structure mirrors trainer/step.py — reference trainer.py:205-325):
  g_fwd           SceneModel train-mode forward only
  g_loss_fwd      full generator loss forward (VGG + D probes, no grad)
  g_update        value_and_grad(g_loss) + Adam        [step section 1]
  vgg_pair        the two VGG feature passes alone
  wrong_layout    pool query + wrong-texture composite [section 2]
  d_mask_update   D_mask loss+grad+Adam                [section 3]
  d_obj_update    D_obj loss+grad+Adam                 [section 4]
  d_img_update    D_img loss+grad+Adam                 [section 5]
  full            the production train step

Sum(g_update, wrong_layout, 3 D updates) ~ full up to fusion effects;
g_update - g_loss_fwd ~ generator backward + optimizer.

Usage: python scripts/train_decomp.py [--batch 12] [--dtypes float32,bfloat16]
Prints one JSON line per (dtype, segment) plus a summary table on stderr.
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import K_LONG, PEAK_BF16_FLOPS, log, per_iter_seconds, preflight


def build(compute_dtype, batch_size, remat=False, scan=True):
    import jax
    import jax.numpy as jnp
    import optax
    from scene_generation_tpu import losses as L
    from scene_generation_tpu.config import Config
    from scene_generation_tpu.data import synthetic_batch
    from scene_generation_tpu.ops.images import wire_to_float
    from scene_generation_tpu.ops.layout import masks_to_layout
    from scene_generation_tpu.trainer import create_train_state
    from scene_generation_tpu.trainer.pools import pool_query
    from scene_generation_tpu.trainer.step import make_train_step

    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype=compute_dtype, remat_generator=remat,
        scan_blocks=scan))
    mc, lw, dc = cfg.model, cfg.loss, cfg.discriminator
    batch = synthetic_batch(cfg, seed=0, batch_size=batch_size)
    mods, state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                     load_vgg=True)
    h, w = mc.image_size
    n, o = batch.objs.shape
    gan_g_loss, gan_d_loss = L.get_gan_losses(dc.gan_loss_type)
    use_lsgan = not dc.no_lsgan

    imgs = wire_to_float(jnp.asarray(batch.imgs))
    objs = jnp.asarray(batch.objs)
    boxes = jnp.asarray(batch.boxes)
    masks = jnp.asarray(batch.masks)
    obj_mask = jnp.asarray(batch.obj_mask)
    triples = jnp.asarray(batch.triples)
    triple_mask = jnp.asarray(batch.triple_mask)
    attributes = jnp.asarray(batch.attributes)
    flat_w = obj_mask.reshape(n * o)
    one_hot_flat = jax.nn.one_hot(objs.reshape(n * o), mc.num_objs)

    # --- generator loss, exactly step.py section 1 -----------------------
    # EVERY jitted probe takes its operands as ARGUMENTS (state, dat, det)
    # — closure-capturing them turns them into compile-time constants and
    # the remote compiler constant-folds for 20+ minutes (CLAUDE.md).
    dat = dict(imgs=imgs, objs=objs, boxes=boxes, masks=masks,
               obj_mask=obj_mask, triples=triples, triple_mask=triple_mask,
               attributes=attributes, flat_w=flat_w,
               one_hot_flat=one_hot_flat)

    def g_loss(g_params, g_stats, other, dat, noise, use_vgg=True):
        out, _ = mods.model.apply(
            {"params": g_params, "batch_stats": g_stats},
            dat["objs"], dat["triples"], dat["attributes"],
            dat["obj_mask"], dat["triple_mask"], noise,
            imgs=dat["imgs"], boxes_gt=dat["boxes"], masks_gt=dat["masks"],
            train=True, mutable=["batch_stats"])
        total = L.mse_loss(out.boxes_pred, dat["boxes"],
                           w=dat["obj_mask"]) * lw.bbox_pred_loss_weight
        if mods.vgg is not None and use_vgg:
            fx = mods.vgg.apply({"params": other["vgg"]}, out.imgs_pred)
            fy = mods.vgg.apply({"params": other["vgg"]}, dat["imgs"])
            total += L.vgg_perceptual_loss(fx, fy) * lw.vgg_features_weight
        (sf, lf, _), _ = mods.d_obj.apply(
            {"params": other["d_obj"], "batch_stats": other["d_obj_stats"]},
            out.imgs_pred, dat["boxes"], dat["obj_mask"], train=True,
            mutable=["batch_stats"])
        total += L.masked_cross_entropy(lf, dat["objs"], w=dat["obj_mask"]) \
            * lw.ac_loss_weight
        total += gan_g_loss(sf, w=dat["obj_mask"]) * lw.d_obj_weight
        mp = out.masks_pred.reshape(n * o, mc.mask_size, mc.mask_size, 1)
        sfm = mods.d_mask.apply({"params": other["d_mask"]}, mp,
                                dat["one_hot_flat"])
        total += L.multiscale_gan_loss(sfm, True, use_lsgan,
                                       w=dat["flat_w"]) * lw.d_mask_weight
        if lw.d_mask_features_weight > 0:
            mf = dat["masks"].reshape(n * o, mc.mask_size, mc.mask_size, 1)
            srm = mods.d_mask.apply({"params": other["d_mask"]}, mf,
                                    dat["one_hot_flat"])
            total += L.feature_matching_loss(sfm, srm, w=dat["flat_w"]) \
                * lw.d_mask_features_weight
        pr = mods.d_img.apply({"params": other["d_img"]},
                              jnp.concatenate([out.layout, dat["imgs"]],
                                              axis=-1))
        pf = mods.d_img.apply(
            {"params": other["d_img"]},
            jnp.concatenate([jax.lax.stop_gradient(out.layout),
                             out.imgs_pred], axis=-1))
        total += L.multiscale_gan_loss(pf, True, use_lsgan) * lw.d_img_weight
        if lw.d_img_features_weight > 0:
            total += L.feature_matching_loss(pf, pr) \
                * lw.d_img_features_weight
        return total, out

    opt_g, opt_d_img, opt_d_obj, opt_d_mask = mods.optimizers()
    other0 = {"vgg": state.vgg_params, "d_obj": state.d_obj_params,
              "d_obj_stats": state.d_obj_stats,
              "d_mask": state.d_mask_params, "d_img": state.d_img_params}

    # Segment programs: fn(state, dat, det, noise) -> chain scalar. The
    # timing chain threads the data dependency through noise.
    segs = {}

    @jax.jit
    def g_fwd(state, dat, det, noise):
        out, _ = mods.model.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            dat["objs"], dat["triples"], dat["attributes"],
            dat["obj_mask"], dat["triple_mask"], noise,
            imgs=dat["imgs"], boxes_gt=dat["boxes"], masks_gt=dat["masks"],
            train=True, mutable=["batch_stats"])
        return jnp.mean(out.imgs_pred)

    segs["g_fwd"] = g_fwd

    @jax.jit
    def g_loss_fwd(state, dat, det, noise):
        other = {"vgg": state.vgg_params, "d_obj": state.d_obj_params,
                 "d_obj_stats": state.d_obj_stats,
                 "d_mask": state.d_mask_params, "d_img": state.d_img_params}
        total, _ = g_loss(state.g_params, state.g_stats, other, dat, noise)
        return total

    segs["g_loss_fwd"] = g_loss_fwd

    @jax.jit
    def g_update(state, dat, det, noise):
        other = {"vgg": state.vgg_params, "d_obj": state.d_obj_params,
                 "d_obj_stats": state.d_obj_stats,
                 "d_mask": state.d_mask_params, "d_img": state.d_img_params}
        (total, _), grads = jax.value_and_grad(g_loss, has_aux=True)(
            state.g_params, state.g_stats, other, dat, noise)
        upd, _ = opt_g.update(grads, state.opt_g, state.g_params)
        return total + sum(jax.tree_util.tree_leaves(
            jax.tree.map(jnp.sum, upd)))

    segs["g_update"] = g_update

    @jax.jit
    def g_fwd_bwd(state, dat, det, noise):
        # Pure generator forward+backward (grad of mean imgs_pred):
        # isolates the model's own backward from the loss heads'.
        def f(p):
            out, _ = mods.model.apply(
                {"params": p, "batch_stats": state.g_stats},
                dat["objs"], dat["triples"], dat["attributes"],
                dat["obj_mask"], dat["triple_mask"], noise,
                imgs=dat["imgs"], boxes_gt=dat["boxes"],
                masks_gt=dat["masks"], train=True,
                mutable=["batch_stats"])
            return jnp.mean(out.imgs_pred)
        val, grads = jax.value_and_grad(f)(state.g_params)
        return val + sum(jax.tree_util.tree_leaves(
            jax.tree.map(jnp.sum, grads)))

    segs["g_fwd_bwd"] = g_fwd_bwd

    @jax.jit
    def g_update_novgg(state, dat, det, noise):
        # Same update, VGG term removed: isolates the VGG fwd+bwd cost
        # inside the generator update.
        other = {"vgg": state.vgg_params, "d_obj": state.d_obj_params,
                 "d_obj_stats": state.d_obj_stats,
                 "d_mask": state.d_mask_params, "d_img": state.d_img_params}

        def loss_novgg(g_params):
            total, _ = g_loss(g_params, state.g_stats, other, dat, noise,
                              use_vgg=False)
            return total
        val, grads = jax.value_and_grad(loss_novgg)(state.g_params)
        upd, _ = opt_g.update(grads, state.opt_g, state.g_params)
        return val + sum(jax.tree_util.tree_leaves(
            jax.tree.map(jnp.sum, upd)))

    segs["g_update_novgg"] = g_update_novgg

    @jax.jit
    def vgg_pair(state, dat, det, noise):
        img2 = dat["imgs"] + noise[0] * 1e-6
        fx = mods.vgg.apply({"params": state.vgg_params}, img2)
        fy = mods.vgg.apply({"params": state.vgg_params}, dat["imgs"])
        return L.vgg_perceptual_loss(fx, fy)

    if mods.vgg is not None:
        segs["vgg_pair"] = vgg_pair

    # Detached tensors for the D segments (computed ONCE, jitted, all
    # operands as arguments).
    @jax.jit
    def detached(state, dat, noise):
        out, _ = mods.model.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            dat["objs"], dat["triples"], dat["attributes"],
            dat["obj_mask"], dat["triple_mask"], noise,
            imgs=dat["imgs"], boxes_gt=dat["boxes"], masks_gt=dat["masks"],
            train=True, mutable=["batch_stats"])
        return dict(
            imgs_pred=jax.lax.stop_gradient(out.imgs_pred),
            masks_pred=jax.lax.stop_gradient(out.masks_pred),
            layout=jax.lax.stop_gradient(out.layout),
            obj_repr=jax.lax.stop_gradient(out.obj_repr),
            cls_vecs=jax.lax.stop_gradient(out.cls_vecs))

    det0 = detached(state, dat, jnp.zeros((mc.mask_noise_dim,), jnp.float32))

    @jax.jit
    def wrong_layout_seg(state, dat, det, noise):
        r = jax.random.PRNGKey(0)
        wrong_rep, _ = pool_query(
            state.pool, r, dat["objs"].reshape(n * o),
            (det["obj_repr"] + noise[0] * 1e-6).reshape(n * o, mc.rep_size),
            dat["flat_w"])
        wv = jnp.concatenate(
            [det["cls_vecs"], wrong_rep.reshape(n, o, mc.rep_size)], axis=-1)
        lw_ = masks_to_layout(wv, dat["boxes"], dat["masks"],
                              dat["obj_mask"], h, w, backend="xla")
        return jnp.mean(lw_)

    segs["wrong_layout"] = wrong_layout_seg

    @jax.jit
    def d_mask_update(state, dat, det, noise):
        mp = (det["masks_pred"] + noise[0] * 1e-6).reshape(
            n * o, mc.mask_size, mc.mask_size, 1)
        mf = dat["masks"].reshape(n * o, mc.mask_size, mc.mask_size, 1)

        def loss(params):
            sf = mods.d_mask.apply({"params": params}, mp,
                                   dat["one_hot_flat"])
            sr = mods.d_mask.apply({"params": params}, mf,
                                   dat["one_hot_flat"])
            return (L.multiscale_gan_loss(sf, False, use_lsgan,
                                          w=dat["flat_w"])
                    + L.multiscale_gan_loss(sr, True, use_lsgan,
                                            w=dat["flat_w"])) * 0.5

        val, grads = jax.value_and_grad(loss)(state.d_mask_params)
        upd, _ = opt_d_mask.update(grads, state.opt_d_mask,
                                   state.d_mask_params)
        return val + sum(jax.tree_util.tree_leaves(
            jax.tree.map(jnp.sum, upd)))

    segs["d_mask_update"] = d_mask_update

    @jax.jit
    def d_obj_update(state, dat, det, noise):
        fake = det["imgs_pred"] + noise[0] * 1e-6

        def loss(params):
            (sf, lf, _), mut = mods.d_obj.apply(
                {"params": params, "batch_stats": state.d_obj_stats},
                fake, dat["boxes"], dat["obj_mask"], train=True,
                mutable=["batch_stats"])
            (sr, lr, _), _ = mods.d_obj.apply(
                {"params": params, "batch_stats": mut["batch_stats"]},
                dat["imgs"], dat["boxes"], dat["obj_mask"], train=True,
                mutable=["batch_stats"])
            return (gan_d_loss(sr, sf, w=dat["obj_mask"]) * 0.5
                    + L.masked_cross_entropy(lr, dat["objs"],
                                             w=dat["obj_mask"])
                    + L.masked_cross_entropy(lf, dat["objs"],
                                             w=dat["obj_mask"]))

        val, grads = jax.value_and_grad(loss)(state.d_obj_params)
        upd, _ = opt_d_obj.update(grads, state.opt_d_obj,
                                  state.d_obj_params)
        return val + sum(jax.tree_util.tree_leaves(
            jax.tree.map(jnp.sum, upd)))

    segs["d_obj_update"] = d_obj_update

    @jax.jit
    def d_img_update(state, dat, det, noise):
        fake = det["imgs_pred"] + noise[0] * 1e-6

        def loss(params):
            f = mods.d_img.apply(
                {"params": params},
                jnp.concatenate([det["layout"], fake], axis=-1))
            wr = mods.d_img.apply(
                {"params": params},
                jnp.concatenate([det["layout"], dat["imgs"]], axis=-1))
            r = mods.d_img.apply(
                {"params": params},
                jnp.concatenate([det["layout"], dat["imgs"]], axis=-1))
            return (L.multiscale_gan_loss(f, False, use_lsgan) * 0.25
                    + L.multiscale_gan_loss(wr, False, use_lsgan) * 0.25
                    + L.multiscale_gan_loss(r, True, use_lsgan) * 0.5)

        val, grads = jax.value_and_grad(loss)(state.d_img_params)
        upd, _ = opt_d_img.update(grads, state.opt_d_img,
                                  state.d_img_params)
        return val + sum(jax.tree_util.tree_leaves(
            jax.tree.map(jnp.sum, upd)))

    segs["d_img_update"] = d_img_update

    # The production step, timed through the same harness for the 'full'
    # row (state threaded, like bench.py's train section).
    step = make_train_step(mods, donate=False)
    return segs, step, state, batch, n, dat, det0


def flops_of(jitted, *args):
    """Exact FLOP/byte counts of the compiled executable (XLA cost
    analysis); None when the backend doesn't expose it."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)) or None,
                float(ca.get("bytes accessed", 0.0)) or None)
    except Exception as e:  # pragma: no cover
        log(f"cost_analysis unavailable: {type(e).__name__}: {e}")
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--k", type=int, default=K_LONG)
    ap.add_argument("--segments", default=None,
                    help="comma-list to run a subset (remote compiles are "
                         "minutes each; chunked runs reuse /tmp/jax_cache). "
                         "'full' selects the production step row.")
    ap.add_argument("--remat", type=int, default=0,
                    help="remat_generator: recompute resblock activations "
                         "in backward — trades FLOPs for HBM bytes (the "
                         "measured binding constraint)")
    ap.add_argument("--scan", type=int, default=1,
                    help="scan_blocks (0 = unrolled resblocks: XLA can "
                         "fuse across block boundaries; scan round-trips "
                         "the carry through HBM per iteration)")
    ap.add_argument("--no_flops", action="store_true",
                    help="skip cost_analysis (saves one lower+compile per "
                         "segment on cold caches)")
    a = ap.parse_args()

    if not preflight():
        sys.exit(1)
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rows = []
    for dtype in a.dtypes.split(","):
        t0 = time.perf_counter()
        segs, step, state, batch, n, dat, det0 = build(
            dtype, a.batch, remat=bool(a.remat), scan=bool(a.scan))
        log(f"[{dtype}] built in {time.perf_counter() - t0:.1f}s")
        noise0 = jnp.zeros((64,), jnp.float32)
        wanted = a.segments.split(",") if a.segments else None

        for name, fn in segs.items():
            if wanted is not None and name not in wanted:
                continue
            t1 = time.perf_counter()
            fn(state, dat, det0, noise0)  # compile
            log(f"[{dtype}] {name} compiled "
                f"{time.perf_counter() - t1:.1f}s")
            fl, by = ((None, None) if a.no_flops
                      else flops_of(fn, state, dat, det0, noise0))
            dt = per_iter_seconds(
                lambda c: c + fn(state, dat, det0, c) * 1e-9, noise0 * 0.0,
                lambda c: float(jnp.sum(c)), k=a.k, repeats=3)
            row = {"dtype": dtype, "segment": name,
                   "ms": round(dt * 1e3, 2),
                   "gflops": round(fl / 1e9, 1) if fl else None,
                   "gbytes": round(by / 1e9, 3) if by else None,
                   "mfu_vs_bf16_peak": (round(fl / dt / PEAK_BF16_FLOPS, 4)
                                        if fl else None)}
            rows.append(row)
            print(json.dumps(row), flush=True)

        # full production step
        if wanted is not None and "full" not in wanted:
            continue
        step(state, batch)
        fl, by = (None, None) if a.no_flops else flops_of(step, state, batch)
        dt = per_iter_seconds(
            lambda c: step(c[0], batch), (state, None),
            lambda c: float(c[1]["total_loss"]), k=min(a.k, 9), repeats=3)
        row = {"dtype": dtype, "segment": "full", "ms": round(dt * 1e3, 2),
               "gflops": round(fl / 1e9, 1) if fl else None,
               "gbytes": round(by / 1e9, 3) if by else None,
               "mfu_vs_bf16_peak": (round(fl / dt / PEAK_BF16_FLOPS, 4)
                                    if fl else None),
               "img_per_sec": round(n / dt, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    log(f"{'dtype':9s} {'segment':14s} {'ms':>8s} {'GFLOP':>8s} "
        f"{'GB':>7s} {'MFU%':>6s}")
    for r in rows:
        log(f"{r['dtype']:9s} {r['segment']:14s} {r['ms']:8.2f} "
            f"{(r['gflops'] or 0):8.1f} {(r['gbytes'] or 0):7.2f} "
            f"{100 * (r['mfu_vs_bf16_peak'] or 0):6.1f}")


if __name__ == "__main__":
    main()
