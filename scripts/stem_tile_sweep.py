"""Tile-height sweep for the fused Pallas stem kernel (ops/pallas/stem.py).

The kernel's grid is (N, H/tile_h); at b128/tile_h=8 that is 2048 grid
steps whose per-step dispatch overhead can dominate the 58-MFLOP dots.
This sweep times stem_pallas alone across tile_h at production shapes
(bf16, H=W=128, O=9, C=64) with the chained-dispatch methodology.

Usage: python scripts/stem_tile_sweep.py [--batches 16,64,128]
                                         [--tiles 8,16,32]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 17
REPEATS = 5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="16,64,128")
    p.add_argument("--tiles", default="8,16,32")
    a = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from scene_generation_tpu.ops.pallas.stem import stem_pallas

    h = w = 128
    o, c = 9, 64
    for bs in (int(x) for x in a.batches.split(",")):
        key = jax.random.PRNGKey(0)
        weights = jax.random.uniform(key, (bs, h + 6, w + 6, o),
                                     jnp.bfloat16)
        g = jax.random.normal(key, (bs, 7, 7, o, c), jnp.bfloat16)
        ref = None
        for tile in (int(x) for x in a.tiles.split(",")):
            try:
                out = stem_pallas(weights, g, tile_h=tile)
                out.block_until_ready()
                got = np.asarray(out[0, :4, :4, 0], np.float32)
            except Exception as e:
                print(json.dumps({"batch": bs, "tile_h": tile,
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
                continue
            if ref is None:
                ref = got
            else:
                assert np.allclose(ref, got, atol=1e-2), (tile, ref, got)

            def step_once(c, tile=tile):
                x, _ = c
                y = stem_pallas(x, g, tile_h=tile)
                # data dependency forces sequential execution
                return (x + y[:, :1, :1, :1].astype(x.dtype) * 1e-9, y)

            from bench import per_iter_seconds
            dt = per_iter_seconds(step_once, (weights, None),
                                  lambda c: float(jnp.mean(c[1])),
                                  k=K, repeats=REPEATS)
            print(json.dumps({"batch": bs, "tile_h": tile,
                              "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
