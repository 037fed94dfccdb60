"""Honest A/B of the bf16 Adam first-moment option (TrainConfig.adam_mu_dtype).

The §30 roofline proved the unrolled train step is HBM-bandwidth-bound at
~95% of its measured ceiling, so byte-removal is the only lever left.
The generator's Adam mu is 765 MB f32 read+written every step (1.53 GB of
the ~39 GB the step moves); storing it bf16 removes ~0.76 GB/step -> the
arithmetic predicts ~2% ms/step. This script measures it with bench.py's
chained-dispatch + forced-readback harness (the only timing pattern that
is honest under the axon tunnel) and reports both ms/step and the exact
bytes-accessed delta from XLA's cost analysis.

First run (2026-08-19, forward order) measured f32 57.52 / bf16 50.05
ms/step — a 13% delta the byte math can't explain, with the f32 leg 7 ms
above §30's 50.2 ms for the identical config. That smells like first-leg
warmup (fresh relay connection / allocator), not a real win; hence
--order to run both directions and --repeat_first to re-time the first
config again at the end of the sweep.

Run on the TPU host:
  python scripts/adam_mu_ab.py                # f32 first
  python scripts/adam_mu_ab.py --order rev    # bf16 first
"""
import argparse
import json
import sys

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root bench harness)


def run(adam_mu_dtype):
    dt, n, mfu, gflops, bytes_gb = bench.bench_train_step(
        compute_dtype="bfloat16", adam_mu_dtype=adam_mu_dtype)
    return {"ms_per_step": round(dt * 1e3, 2),
            "img_per_s": round(n / dt, 1),
            "mfu": round(mfu, 4) if mfu else None,
            "gflops": gflops,
            "bytes_gb": round(bytes_gb, 2) if bytes_gb else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", choices=["fwd", "rev"], default="fwd",
                    help="fwd: f32 mu first; rev: bf16 mu first")
    ap.add_argument("--repeat_first", action="store_true",
                    help="re-time the first config at the end (warmup probe)")
    args = ap.parse_args()

    legs = [("f32_mu", ""), ("bf16_mu", "bfloat16")]
    if args.order == "rev":
        legs = legs[::-1]
    out = {"order": args.order}
    for tag, mu in legs:
        bench.log(f"=== adam_mu_dtype={mu or 'float32 (default)'} ===")
        out[tag] = run(mu)
    if args.repeat_first:
        tag, mu = legs[0]
        bench.log(f"=== repeat {tag} (warmup probe) ===")
        out[tag + "_repeat"] = run(mu)
    a, b = out["f32_mu"]["ms_per_step"], out["bf16_mu"]["ms_per_step"]
    out["delta_ms"] = round(a - b, 2)
    out["delta_pct"] = round((a - b) / a * 100, 2)
    if out["f32_mu"]["bytes_gb"] and out["bf16_mu"]["bytes_gb"]:
        out["bytes_delta_gb"] = round(
            out["f32_mu"]["bytes_gb"] - out["bf16_mu"]["bytes_gb"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
