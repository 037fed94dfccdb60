"""Stem-conv A/B: dense 204-channel conv vs the factored rank-O forms.

Times ONLY the generator stem (reflect-padded 7x7 conv at 128x128) on the
local accelerator with the chained-dispatch + single-readback methodology
(bench.py): dense materialized-layout conv vs StemConv's two factored
implementations ('grouped' vmapped conv, 'shifts' 49 shifted matmuls).
All three compute the identical linear map (tests/test_factored_stem.py).

Usage: python scripts/stem_microbench.py [--batches 16,64,128] [--d 204]
Prints one JSON line per (impl, batch).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 33
REPEATS = 5


def per_iter(step, state0):
    # Shared harness (bench.py): step threads its own carry tuple.
    import jax.numpy as jnp
    from bench import per_iter_seconds
    return per_iter_seconds(
        step, state0, lambda s: float(jnp.sum(s[0][0, 0, 0])),
        k=K, repeats=REPEATS)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="16,64,128")
    p.add_argument("--d", type=int, default=204)
    p.add_argument("--o", type=int, default=9)
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--hw", type=int, default=128)
    a = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from scene_generation_tpu.models.generators import StemConv
    from scene_generation_tpu.models.layers import reflect_pad_2d

    hw, o, d, c = a.hw, a.o, a.d, a.c
    for bs in (int(x) for x in a.batches.split(",")):
        key = jax.random.PRNGKey(0)
        wmap = jax.random.uniform(key, (bs, hw, hw, o), jnp.bfloat16)
        vecs = jax.random.normal(key, (bs, o, d), jnp.bfloat16)
        layout = jnp.einsum("nhwo,nod->nhwd", wmap, vecs)
        variables = StemConv(c, dtype=jnp.bfloat16).init(key, layout)

        for impl in ("dense", "patches", "pallas", "slices", "grouped",
                     "shifts"):
            sc = StemConv(c, dtype=jnp.bfloat16,
                          factored_impl=impl if impl != "dense" else "grouped")

            if impl == "dense":
                @jax.jit
                def step(s, sc=sc):
                    lay, v = s
                    out = sc.apply(v, reflect_pad_2d(lay, 3))
                    # feed a data-dependent perturbation forward so chained
                    # calls execute sequentially on-device
                    return (lay + jnp.mean(out).astype(lay.dtype) * 1e-6, v)
                state0 = (layout, variables)
            else:
                @jax.jit
                def step(s, sc=sc):
                    wm, vc, v = s
                    out = sc.apply(v, weights=reflect_pad_2d(wm, 3), vecs=vc)
                    return (wm + jnp.mean(out).astype(wm.dtype) * 1e-6, vc, v)
                state0 = (wmap, vecs, variables)

            s = step(state0)
            float(jnp.sum(s[0][0, 0, 0]))  # warm/compile
            dt = per_iter(step, state0)
            dense_gflop = 2 * bs * hw * hw * 49 * d * c / 1e9
            print(json.dumps({
                "impl": impl, "batch": bs,
                "ms": round(dt * 1e3, 3),
                "equiv_dense_gflops": round(dense_gflop, 1),
                "effective_tflops": round(dense_gflop / dt / 1e3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
