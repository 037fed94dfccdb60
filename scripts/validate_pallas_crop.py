"""Hardware validation of the fused custom-VJP Pallas ROI crop
(ops/pallas/crop.py) — the gate for flipping crop_bbox_batch's default
backend to 'auto'.

Checks fwd + grad parity vs the XLA backend at the two production shapes
(D_obj crops 32px, appearance-encoder crops 64px) at highest matmul
precision, then times both backends (fwd and fwd+bwd chains).

Usage: python scripts/validate_pallas_crop.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(m, flush=True)


def case(n=12, o=9, h=128, w=128, c=3, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.rand(n, h, w, c).astype(np.float32)
    x0 = rng.uniform(0, .5, (n, o))
    y0 = rng.uniform(0, .5, (n, o))
    boxes = np.stack([x0, y0, x0 + rng.uniform(.2, .5, (n, o)),
                      y0 + rng.uniform(.2, .5, (n, o))], -1).astype(np.float32)
    boxes[0, 0] = [0.3, 0.3, 0.3, 0.8]      # degenerate
    boxes[0, 1] = [0.7, 0.7, 1.4, 1.4]      # partially out of frame
    return jnp.asarray(imgs), jnp.asarray(boxes)


def validate(hh):
    from scene_generation_tpu.ops.crop import crop_bbox_batch

    imgs, boxes = case()
    g = jnp.asarray(np.random.RandomState(7).randn(
        imgs.shape[0], boxes.shape[1], hh, hh, 3).astype(np.float32))

    def make(backend):
        @jax.jit
        def fwd(imgs, boxes):
            return crop_bbox_batch(imgs, boxes, hh, backend=backend)

        @jax.jit
        def lag(imgs, boxes):
            def loss(im, b):
                return jnp.sum(crop_bbox_batch(im, b, hh,
                                               backend=backend) * g)
            return jax.value_and_grad(loss, argnums=(0, 1))(imgs, boxes)
        return fwd, lag

    res = {}
    with jax.default_matmul_precision("highest"):
        for backend in ("xla", "pallas"):
            fwd, lag = make(backend)
            out = fwd(imgs, boxes)
            l, grads = lag(imgs, boxes)
            jax.block_until_ready((out, l, grads))
            res[backend] = (np.asarray(out), float(l),
                            [np.asarray(x) for x in grads])
    np.testing.assert_allclose(res["pallas"][0], res["xla"][0], atol=1e-3,
                               rtol=1e-3)
    for gp, gx, name in zip(res["pallas"][2], res["xla"][2],
                            ("imgs", "boxes")):
        scale = np.abs(gx).max() + 1e-8
        diff = np.abs(gp - gx).max()
        log(f"[crop{hh}] grad({name}): max_abs_diff={diff:.3e} "
            f"(scale {scale:.3e})")
        assert diff < 5e-3 * scale, name
    log(f"[crop{hh}] PARITY OK")

    def chain(fn, k=400):
        # k must be large: these ops are ~0.1 ms, so the K=1-subtracted
        # marginal time needs K >> (tunnel jitter / op time) to resolve.
        # One device executes enqueued calls in order; K dispatches + one
        # float() readback (block_until_ready is a NO-OP under the axon
        # tunnel) amortize tunnel latency; K=1 baseline subtracted.
        import jax.numpy as jnp

        def once(kk):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = None
                for _ in range(kk):
                    r = fn(imgs, boxes)
                first = r[0] if isinstance(r, tuple) else r
                float(jnp.sum(jnp.ravel(first)[0]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1 = once(1)
        tk = once(k)
        return (tk - t1) / (k - 1)

    for backend in ("xla", "pallas"):
        fwd, lag = make(backend)
        jax.block_until_ready(fwd(imgs, boxes))
        jax.block_until_ready(lag(imgs, boxes))
        t_f = chain(fwd)
        t_fb = chain(lag)
        log(f"[crop{hh}] {backend}: fwd {t_f*1e3:.3f} ms  fwd+bwd "
            f"{t_fb*1e3:.3f} ms")


if __name__ == "__main__":
    for hh in (32, 64):
        validate(hh)
    log("ALL OK")
    sys.exit(0)
