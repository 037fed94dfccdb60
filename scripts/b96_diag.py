"""Per-layer diagnosis of the batch-96 serving MFU dip (VERDICT r4 #6).

RESULTS §32 localized the dip to the generator arm itself (62-69% MFU at
b96 vs 74/80% at b64/b128) after proving the front-end flat. This bench
times each DISTINCT conv shape of the serving GlobalGenerator standalone
(bf16, NHWC, fwd only) at b64/b96/b128 and reports per-layer ms, GFLOP/s
and MFU — whichever layer's efficiency is non-monotonic in batch is the
mechanism. Padding to b128 is NOT a workaround worth taking a priori:
b96's measured end-to-end 2003 img/s already beats feeding 96 real images
inside a b128 batch (2277 * 96/128 = 1708 effective img/s).

Run on the TPU host:  python scripts/b96_diag.py [--batches 64 96 128]
"""
import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

PEAK = 197e12  # v5e bf16 peak FLOP/s

# (tag, H, W, Cin, Cout, k, stride) for every distinct conv shape in the
# serving generator at image_size 128, ngf 64, n_downsampling 4
# (models/generators.py GlobalGenerator): stem handled by the Pallas path
# (§23), so start from the downsample chain; resblocks are 9 identical
# 3x3 convs at the bottleneck; upsample chain mirrors (transpose convs
# timed as convs of the same arithmetic shape on the upsampled grid).
SHAPES = [
    ("down0 64->128 @64", 128, 128, 64, 128, 3, 2),
    ("down1 128->256 @32", 64, 64, 128, 256, 3, 2),
    ("down2 256->512 @16", 32, 32, 256, 512, 3, 2),
    ("down3 512->1024 @8", 16, 16, 512, 1024, 3, 2),
    ("resblock 1024 @8", 8, 8, 1024, 1024, 3, 1),
    ("up-equiv 1024->512 @16", 16, 16, 1024, 512, 3, 1),
    ("up-equiv 512->256 @32", 32, 32, 512, 256, 3, 1),
    ("up-equiv 256->128 @64", 64, 64, 256, 128, 3, 1),
    ("up-equiv 128->64 @128", 128, 128, 128, 64, 3, 1),
    ("final 64->3 7x7 @128", 128, 128, 64, 3, 7, 1),
]


# The real generator upsamples with TRANSPOSE convs (stride-2, k=3); the
# "up-equiv" rows above time arithmetic-equivalent stride-1 convs, which
# the first sweep showed do NOT dip at b96 — so --transpose times the
# actual lhs-dilated form XLA lowers ConvTranspose to. (tag, Hin, Win,
# Cin, Cout): input is the PRE-upsample grid.
TRANSPOSE_SHAPES = [
    ("convT 1024->512 @8->16", 8, 8, 1024, 512),
    ("convT 512->256 @16->32", 16, 16, 512, 256),
    ("convT 256->128 @32->64", 32, 32, 256, 128),
    ("convT 128->64 @64->128", 64, 64, 128, 64),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 96, 128])
    ap.add_argument("--transpose", action="store_true",
                    help="time the real stride-2 transpose convs instead")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from bench import per_iter_seconds, log

    rows = []
    if args.transpose:
        shapes = [(tag, h, w, cin, cout, 3, 2)
                  for tag, h, w, cin, cout in TRANSPOSE_SHAPES]
    else:
        shapes = SHAPES
    for tag, h, w, cin, cout, k, s in shapes:
        kern = jax.random.normal(
            jax.random.PRNGKey(1), (k, k, cin, cout), jnp.bfloat16) * 0.05

        if args.transpose:
            # Exactly what flax nn.ConvTranspose(padding='SAME') lowers to
            # (generators.py:296): lax.conv_transpose, unflipped kernel.
            @functools.partial(jax.jit, static_argnums=(2,))
            def conv(x, kern, stride):
                return jax.lax.conv_transpose(
                    x, kern, (stride, stride), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            @functools.partial(jax.jit, static_argnums=(2,))
            def conv(x, kern, stride):
                return jax.lax.conv_general_dilated(
                    x, kern, (stride, stride), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

        for b in args.batches:
            x = jax.random.normal(jax.random.PRNGKey(0),
                                  (b, h, w, cin), jnp.bfloat16)
            # chained dispatch: feed output stats back in so the chain
            # cannot be reordered; single readback syncs (bench.py).
            def step(c):
                y = conv(x * (1.0 + 0.0 * jnp.mean(c[0])), kern, s)
                return (y,)
            y0 = conv(x, kern, s)
            dt = per_iter_seconds(
                step, (y0,), lambda c: float(jnp.mean(c[0])),
                k=33, repeats=5)
            # Transpose FLOPs counted at OUTPUT res (the dense conv on the
            # lhs-dilated input XLA actually executes — matches bench.py's
            # analytic ×4 accounting for the upsample chain).
            ho, wo = ((h * s, w * s) if args.transpose
                      else ((h + s - 1) // s, (w + s - 1) // s))
            gflop = 2 * b * ho * wo * k * k * cin * cout / 1e9
            mfu = gflop * 1e9 / dt / PEAK
            row = {"layer": tag, "batch": b, "ms": round(dt * 1e3, 4),
                   "gflop": round(gflop, 2), "mfu": round(mfu, 4),
                   "ms_per_img": round(dt * 1e3 / b, 5)}
            rows.append(row)
            log(json.dumps(row))

    # Flag non-monotonic per-image cost (the dip signature).
    print("\n== per-image ms by batch (dip = middle column worst) ==")
    for tag, *_ in shapes:
        r = {x["batch"]: x for x in rows if x["layer"] == tag}
        bs = sorted(r)
        line = {str(b): r[b]["ms_per_img"] for b in bs}
        dip = (len(bs) == 3 and
               r[bs[1]]["ms_per_img"] > max(r[bs[0]]["ms_per_img"],
                                            r[bs[2]]["ms_per_img"]) * 1.05)
        print(json.dumps({"layer": tag, **line, "dip": dip}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
