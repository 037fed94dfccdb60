"""End-to-end serving A/B: factored rank-O stem vs dense layout stem.

Times the FULL test-mode pipeline (scene graph -> GCN -> boxes/masks ->
occlusion compositing -> pix2pixHD generator) via bench.build_forward with
config.factored_stem toggled, chained-dispatch + single-readback
methodology. The dense arm uses the production dense default (Pallas
occlusion compositor via test_compositor_backend='auto' on TPU).

Usage: python scripts/stem_ab.py [--batches 16,64,128]
Prints one JSON line per (arm, batch).
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
    a = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from bench import build_forward, per_iter_seconds

    # Arms: dense layout stem; factored stem via the XLA 'patches' form;
    # factored stem via the fused Pallas VMEM kernel (the TPU default,
    # test_stem_backend='auto').
    arms = {"dense": dict(factored_stem=False),
            "patches": dict(test_stem_backend="xla"),
            "pallas": dict(test_stem_backend="pallas")}
    for bs in (int(x) for x in a.batches.split(",")):
        for arm, kw in arms.items():
            single, variables, inputs, mc = build_forward(bs, **kw)
            noise0 = jnp.zeros((mc.mask_noise_dim,), jnp.float32)
            img, _ = single(variables, inputs, noise0)
            float(jnp.mean(img))

            dt = per_iter_seconds(
                lambda c, s=single, v=variables, i=inputs: s(v, i, c[1]),
                (None, noise0), lambda c: float(jnp.mean(c[0])),
                k=K, repeats=REPEATS)
            print(json.dumps({
                "arm": arm, "batch": bs,
                "ms": round(dt * 1e3, 2),
                "img_per_sec": round(bs / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
