"""Train-step batch-scaling study: amortize the weight/optimizer byte
stream that binds the step at batch 12.

§30 measured the unrolled bf16 train step HBM-bound at ~95% of its
roofline with arithmetic intensity only ~59 FLOP/B — because at the
reference's batch 12 the PER-STEP-CONSTANT byte streams (f32 params read
by fwd/bwd casts and by Adam, gradients, both moments, across G + 3 Ds)
dwarf the activation traffic. Those bytes don't grow with batch; the
FLOPs do. Growing the batch is therefore not a scheduling trick but a
ROOFLINE RAISE: intensity ~doubles per batch doubling until activation
traffic catches up, and per-image cost drops.

This is a THROUGHPUT study only: ms/step, img/s, MFU, bytes/step from
XLA's compiled cost analysis at each batch. It makes no claim about
quality at larger batches (all committed quality runs are b12, the
reference's setting); a production run that adopts b>=24 should rescale
lr / re-validate.

Run on the TPU host:  python scripts/train_batch_scaling.py [--batches ...]
"""
import argparse
import json
import sys

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[12, 24, 48, 96])
    args = ap.parse_args()

    rows = {}
    for b in args.batches:
        bench.log(f"=== train step, batch {b} (bf16, unrolled) ===")
        dt, n, mfu, gflops, bytes_gb = bench.bench_train_step(
            compute_dtype="bfloat16", batch_size=b)
        rows[b] = {
            "ms_per_step": round(dt * 1e3, 2),
            "img_per_s": round(n / dt, 1),
            "mfu": round(mfu, 4) if mfu else None,
            "gflops": round(gflops, 1) if gflops else None,
            "bytes_gb": round(bytes_gb, 2) if bytes_gb else None,
            "intensity_flop_per_byte": (
                round(gflops / bytes_gb, 1)
                if gflops and bytes_gb else None),
        }
        print(json.dumps({str(b): rows[b]}), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
