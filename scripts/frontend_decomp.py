"""Serving FRONT-END decomposition: where do the non-generator ms go?

§30's serving_decomp re-run showed the b64->b128 serving fall-off
(2211 -> 1918 img/s) lives entirely in the front-end: the generator arm
IMPROVES per image with batch (0.376 -> 0.350 ms/img, 74.3% -> 79.8% MFU)
while the front-end jumps 0.076 -> 0.171 ms/img between b64 and b96 and
stays there. This script times the front-end's candidate owners as
separately jitted programs (bench.py chained-dispatch harness, operands
passed as arguments) to find the step:

  mlw_test    masks_to_layout_weights, occlusion path (full test-mode op)
  mlw_train   same op, plain-sum path (isolates the occlusion epilogue)
  sample      _sample_masks alone (the two resample einsums)
  occl_post   the occlusion epilogue alone (argsort/gather/cumsum given
              the sampled field)

Usage: python scripts/frontend_decomp.py [--batches 64,96,128]
Prints one JSON line per (batch, segment).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import per_iter_seconds

K = 17
REPEATS = 5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="64,96,128")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--mask_size", type=int, default=32)
    p.add_argument("--num_objs", type=int, default=9)
    p.add_argument("--layout_d", type=int, default=204)
    a = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from scene_generation_tpu.ops import layout as LO

    dtype = jnp.dtype(a.dtype)
    h = w = a.hw
    o, m, d = a.num_objs, a.mask_size, a.layout_d

    def inputs(bs):
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 4)
        lo = jax.random.uniform(ks[0], (bs, o, 2), dtype, 0.0, 0.6)
        sz = jax.random.uniform(ks[1], (bs, o, 2), dtype, 0.2, 0.4)
        boxes = jnp.concatenate([lo, lo + sz], axis=-1)
        masks = jax.random.uniform(ks[2], (bs, o, m, m), dtype)
        vecs = jax.random.normal(ks[3], (bs, o, d), dtype)
        obj_mask = jnp.ones((bs, o), jnp.float32)
        return vecs, boxes, masks, obj_mask

    def timed(fn, args, bs):
        # carry = (out, noise): the noise perturbs an operand each
        # iteration (defeats CSE across the chain) and the single final
        # readback syncs — bench.py's chained-dispatch methodology.
        def step(*a):
            *ops, n = a
            out = fn(*ops, n)
            return out, n + jnp.mean(out).astype(dtype) * 1e-6

        jfn = jax.jit(step)
        noise0 = jnp.zeros((), dtype)
        out, _ = jfn(*args, noise0)
        float(jnp.mean(out))
        return per_iter_seconds(
            lambda c: jfn(*args, c[1]), (None, noise0),
            lambda c: float(jnp.mean(c[0])), k=K, repeats=REPEATS)

    for bs in (int(x) for x in a.batches.split(",")):
        vecs, boxes, masks, obj_mask = inputs(bs)
        sampled = jax.jit(
            lambda b, mk: LO._sample_masks(b, mk, h, w))(boxes, masks)
        segs = {}

        segs["mlw_test"] = timed(
            lambda v, b, mk, om, n: LO.masks_to_layout_weights(
                v + n, b, mk, om, h, w, test_mode=True),
            (vecs, boxes, masks, obj_mask), bs)
        segs["mlw_train"] = timed(
            lambda v, b, mk, om, n: LO.masks_to_layout_weights(
                v + n, b, mk, om, h, w, test_mode=False),
            (vecs, boxes, masks, obj_mask), bs)
        segs["sample"] = timed(
            lambda b, mk, n: LO._sample_masks(b, mk + n, h, w),
            (boxes, masks), bs)

        # NOTE: this inlines ops/layout.py's SORT-path occlusion epilogue
        # (argsort by painter's mass -> cumsum claim -> unsort) so it can
        # be timed on a pre-sampled field with added noise; it must mirror
        # layout.py's sort branch — if that branch changes, update this or
        # the microbench measures stale code. The serving default is the
        # precedence-MATRIX form (occlusion_impl="matrix"); this segment
        # exists to attribute the sort-path cost it replaced (RESULTS §32).
        def occl_post(s, v, om, n):
            s = s + n
            mass = jnp.sum(v, axis=-1) * jnp.sum(s, axis=(-1, -2))
            big = jnp.asarray(jnp.finfo(dtype).max, dtype)
            mass = jnp.where(om.astype(bool), mass, big)
            order = jnp.argsort(mass, axis=-1)

            def per_image(s_i, order_i, valid_i):
                si = jnp.take(s_i, order_i, axis=0)
                vm = jnp.take(valid_i, order_i, axis=0)
                binm = (si > 0.5).astype(dtype) * vm[:, None, None]
                taken = jnp.cumsum(binm, axis=0)
                prev = jnp.minimum(taken - binm, 1.0)
                claim = binm * (1.0 - prev)
                inv = jnp.argsort(order_i)
                return jnp.take(si * claim, inv, axis=0)

            return jax.vmap(per_image)(s, order, om.astype(dtype))

        segs["occl_post"] = timed(
            occl_post, (sampled, vecs, obj_mask), bs)

        for name, dt in segs.items():
            print(json.dumps({
                "batch": bs, "segment": name,
                "ms": round(dt * 1e3, 3),
                "ms_per_img": round(dt * 1e3 / bs, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
