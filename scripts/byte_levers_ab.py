"""Honest A/B of ALL remaining HBM byte-removal levers (VERDICT r4 #2).

§30: the unrolled train step is bandwidth-bound at ~95% of its measured
roofline; §35 measured the first lever (bf16 Adam mu, −1.23 GB/step,
−2.8%, bandwidth-exact). This script measures the rest in ONE process
(§35's warmup trap: the first leg of a fresh session reads several ms
slow, so the BASELINE runs last and the first leg is re-timed at the end):

- mu:    adam_mu_dtype=bfloat16   (optax passthrough, §35)
- grads: grads_dtype=bfloat16     (trainer/step.py casts each grad tree at
         the backward->optimizer boundary; moment math promotes to f32)
- nu16:  adam_nu_dtype=float16    (trainer/optim.py custom transform; f16
         has the resolution bf16 lacks at b2=0.999 — tests/test_optim.py —
         but underflows for sustained |g| < ~2e-4, so this leg exists for
         the byte/ms record, not as a production recommendation)
- mu_grads: both bf16 levers combined.

Reference parity baseline: torch Adam keeps moments and grads f32
(reference trainer.py:60,80,106,133).

Run on the TPU host:  python scripts/byte_levers_ab.py [--out /tmp/x.json]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import bench  # noqa: E402


LEGS = {
    "mu": {"adam_mu_dtype": "bfloat16"},
    "grads": {"grads_dtype": "bfloat16"},
    "nu16": {"adam_nu_dtype": "float16"},
    "mu_grads": {"adam_mu_dtype": "bfloat16", "grads_dtype": "bfloat16"},
    # remat: per-block rematerialization of the 9 UNROLLED resblocks
    # (nn.remat in generators.py) — the last §30 byte lever named in
    # CLAUDE.md. Trades block-interior activation HBM traffic for ~2x
    # resblock fwd FLOPs in the bwd; at 128px the bottleneck activations
    # are (12,8,8,1024)*2B ≈ 1.6 MB/tensor, so the byte math predicts
    # ~nothing — this leg exists to close the backlog with a measurement.
    "remat": {"remat": True},
    "base": {},
}


def run(**kw):
    dt, n, mfu, gflops, bytes_gb = bench.bench_train_step(
        compute_dtype="bfloat16", **kw)
    return {"ms_per_step": round(dt * 1e3, 2),
            "img_per_s": round(n / dt, 1),
            "mfu": round(mfu, 4) if mfu else None,
            "bytes_gb": round(bytes_gb, 2) if bytes_gb else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", nargs="+", default=list(LEGS),
                    help="subset + order of legs to run (base runs the "
                         "timing baseline; keep it LAST — warmup trap)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    out = {}
    for tag in args.legs:
        bench.log(f"=== leg {tag}: {LEGS[tag] or 'f32 (reference parity)'} ===")
        out[tag] = run(**LEGS[tag])
    # Re-time the first leg: if it moved, the sweep had warmup drift and
    # the numbers are not comparable (§35's 13% phantom).
    first = args.legs[0]
    bench.log(f"=== repeat {first} (warmup probe) ===")
    out[first + "_repeat"] = run(**LEGS[first])

    if "base" in out:
        base = out["base"]
        for tag in args.legs:
            if tag == "base":
                continue
            out[tag]["delta_ms"] = round(
                base["ms_per_step"] - out[tag]["ms_per_step"], 2)
            out[tag]["delta_pct"] = round(
                out[tag]["delta_ms"] / base["ms_per_step"] * 100, 2)
            if base["bytes_gb"] and out[tag]["bytes_gb"]:
                out[tag]["bytes_delta_gb"] = round(
                    base["bytes_gb"] - out[tag]["bytes_gb"], 2)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
