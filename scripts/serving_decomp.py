"""Serving-time decomposition: full pipeline vs generator-alone.

Quantifies where serving time goes (RESULTS.md §13/§20) with the honest
chained-dispatch + single-readback methodology from bench.py: per-config,
times the FULL test-mode pipeline (scene graph -> GCN -> boxes/masks ->
occlusion compositor -> pix2pixHD generator) and the GlobalGenerator alone
on a pre-built layout, at the same batch; front-end = difference. Runs the
one-hot (reference-parity) and learned-embedding (layout_embed_dim=64)
configurations across batch sizes.

Usage: python scripts/serving_decomp.py [--batches 64,128] [--embed 0,64]
Prints one JSON line per (embed, batch) config.

--factored 1 (default): both arms use the production factored-stem path
(generator-alone consumes the (N,H,W,O) weight field + per-object vecs,
stem via test_stem_backend='auto' -> Pallas on TPU). --factored 0
restores the round-2 dense decomposition (§13/§21 numbers).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

K = 17
REPEATS = 5
PEAK = 197e12  # v5e bf16 peak


def per_iter(fn, args, noise0):
    # Shared harness (bench.py): carry = (out, noise); one readback syncs.
    import jax.numpy as jnp
    from bench import per_iter_seconds
    return per_iter_seconds(
        lambda c: fn(*args, c[1]), (None, noise0),
        lambda c: float(jnp.mean(c[0])), k=K, repeats=REPEATS)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="64,128")
    p.add_argument("--embed", default="0,64")
    p.add_argument("--factored", type=int, default=1)
    a = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import analytic_generator_gflops, build_forward
    from scene_generation_tpu.models.generators import GlobalGenerator

    for embed in (int(x) for x in a.embed.split(",")):
        for bs in (int(x) for x in a.batches.split(",")):
            single, variables, inputs, mc = build_forward(
                bs, layout_embed_dim=embed,
                factored_stem=bool(a.factored))
            noise0 = jnp.zeros((mc.mask_noise_dim,), jnp.float32)
            img, _ = single(variables, inputs, noise0)
            float(jnp.mean(img))
            dt_full = per_iter(lambda v, i, n: single(v, i, n),
                               (variables, inputs), noise0)

            # Generator alone on a pre-built layout.
            h, w = mc.image_size
            d = mc.layout_nc
            gen = GlobalGenerator(output_nc=mc.output_nc, ngf=mc.ngf,
                                  n_downsampling=mc.n_downsample_global,
                                  n_blocks=mc.n_blocks_global,
                                  scan_blocks=mc.scan_blocks,
                                  dtype=mc.jax_compute_dtype)
            layout = jnp.zeros((bs, h, w, d), mc.jax_compute_dtype)
            if a.factored:
                stem_impl = ("pallas"
                             if jax.default_backend() == "tpu" else None)
                lw = jnp.zeros((bs, h, w, 9), mc.jax_compute_dtype)
                lv = jnp.zeros((bs, 9, d), mc.jax_compute_dtype)
                gvars = jax.jit(lambda k, w_, v_: gen.init(
                    k, layout_weights=w_, layout_vecs=v_))(
                        jax.random.PRNGKey(0), lw, lv)

                @jax.jit
                def gen_fwd(gvars, pair, noise):
                    w_, v_ = pair
                    out = gen.apply(
                        gvars,
                        layout_weights=w_ + noise[0].astype(w_.dtype),
                        layout_vecs=v_, stem_impl=stem_impl)
                    return out, noise + jnp.mean(out).astype(noise.dtype) * 1e-6

                layout = (lw, lv)
            else:
                gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), layout)

                @jax.jit
                def gen_fwd(gvars, layout, noise):
                    out = gen.apply(gvars,
                                    layout + noise[0].astype(layout.dtype))
                    return out, noise + jnp.mean(out).astype(noise.dtype) * 1e-6

            out, _ = gen_fwd(gvars, layout, noise0)
            float(jnp.mean(out))
            dt_gen = per_iter(lambda v, l, n: gen_fwd(v, l, n),
                              (gvars, layout), noise0)

            gflops = analytic_generator_gflops(mc, bs)
            print(json.dumps({
                "layout_embed_dim": embed, "batch": bs,
                "full_ms": round(dt_full * 1e3, 2),
                "generator_ms": round(dt_gen * 1e3, 2),
                "front_end_ms": round((dt_full - dt_gen) * 1e3, 2),
                "img_per_sec": round(bs / dt_full, 1),
                "pipeline_mfu": round(gflops * 1e9 / dt_full / PEAK, 4),
                "generator_mfu": round(gflops * 1e9 / dt_gen / PEAK, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
