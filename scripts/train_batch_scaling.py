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
lr / re-validate (runs/r5_b24 is that validation run).

Each batch runs in its OWN SUBPROCESS with donate=True (the production
train.py memory profile — one live train state): an OOM at one batch is
recorded as {"oom": true} and the sweep continues instead of dying.

Run on the TPU host:  python scripts/train_batch_scaling.py [--batches ...]
"""
import argparse
import json
import subprocess
import sys

sys.path.insert(0, ".")


def run_one(b, adam_mu_dtype=""):
    import bench
    bench.log(f"=== train step, batch {b} (bf16, unrolled, donated) ===")
    dt, n, mfu, gflops, bytes_gb = bench.bench_train_step(
        compute_dtype="bfloat16", batch_size=b, donate=True,
        adam_mu_dtype=adam_mu_dtype)
    return {
        "ms_per_step": round(dt * 1e3, 2),
        "img_per_s": round(n / dt, 1),
        "mfu": round(mfu, 4) if mfu else None,
        "gflops": round(gflops, 1) if gflops else None,
        "bytes_gb": round(bytes_gb, 2) if bytes_gb else None,
        "intensity_flop_per_byte": (
            round(gflops / bytes_gb, 1) if gflops and bytes_gb else None),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[12, 24, 48, 96])
    ap.add_argument("--adam_mu_dtype", default="")
    ap.add_argument("--one_batch", type=int, default=0,
                    help="internal: run a single batch and print one JSON")
    args = ap.parse_args()

    if args.one_batch:
        print("RESULT " + json.dumps(run_one(args.one_batch,
                                             args.adam_mu_dtype)),
              flush=True)
        return

    rows = {}
    for b in args.batches:
        cmd = [sys.executable, __file__, "--one_batch", str(b)]
        if args.adam_mu_dtype:
            cmd += ["--adam_mu_dtype", args.adam_mu_dtype]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=2400)
        out = proc.stdout
        row = None
        for line in out.splitlines():
            if line.startswith("RESULT "):
                row = json.loads(line[len("RESULT "):])
        if row is None:
            tail = (out + proc.stderr)[-2000:]
            oom = "RESOURCE_EXHAUSTED" in tail or "ResourceExhausted" in tail
            row = {"oom": oom, "error": None if oom else tail[-400:]}
        rows[b] = row
        print(json.dumps({str(b): row}), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
