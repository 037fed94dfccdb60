"""Bracket the serving-throughput peak past b256 (VERDICT r4 #8).

The best serving point moved right three times (b16 -> b64 -> b128 ->
b256, RESULTS §41); this probe extends the curve with b320/b384/b512
using bench.py's exact harness (chained dispatch, K=1 baseline
subtraction) so the numbers are directly comparable to the published
rows. An OOM is recorded as the HBM capacity limit, not an error.

Run on the TPU host:  python scripts/serving_peak_probe.py [--batches ...]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[320, 384, 512])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from bench import bench_inference, log

    rows = []
    for b in args.batches:
        try:
            rate, mfu = bench_inference(b)
            rows.append({"batch": b, "img_per_s": round(rate, 1),
                         "mfu": round(mfu, 4)})
        except Exception as e:  # OOM or compile failure: record, continue
            msg = f"{type(e).__name__}: {str(e)[:300]}"
            log(f"[b{b}] FAILED {msg}")
            rows.append({"batch": b, "error": msg})
    print(json.dumps(rows, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
