"""Aggregate multi-seed eval_run summaries into a mean +/- std table.

VERDICT r3 weak #2 asked for the run-to-run noise band of the evaluation
protocol (the reference's own protocol is a single pass of
sample_images.py:241-295 — it has no variance estimate either): run
`scripts/eval_run.py --seed K --save_root DIR_K` for several seeds on a
FIXED checkpoint, then aggregate with this script. The seed drives both
the val-set draw (which scenes are evaluated) and the model's sampling
noise, so the band covers the full protocol, not just model stochasticity.

Usage:
  python scripts/noise_band.py runs/r4_main runs/r4_eval_s1 runs/r4_eval_s2 \
      [--out_json runs/noise_band.json]

Prints a markdown table (one row per metric) and optionally writes the
raw per-seed values + aggregates as JSON.
"""
import argparse
import json
import math
import os

# metric key -> (json path into eval_summary.json)
METRICS = {
    "gtattr IoU": ("samples_gtattr", "avg_iou"),
    "gtattr recall@0.5": ("samples_gtattr", "recall@0.5"),
    "gtattr recall@0.3": ("samples_gtattr", "recall@0.3"),
    "sg IoU": ("samples_sg", "avg_iou"),
    "sg recall@0.5": ("samples_sg", "recall@0.5"),
    "sg recall@0.3": ("samples_sg", "recall@0.3"),
    "FID gt-layout (rel)": ("fid_gtlayout", "fid"),
    "FID sg (rel)": ("fid_sg", "fid"),
    "diversity LPIPS": ("diversity", "diversity_lpips_mean"),
    "diversity/between": ("diversity", "diversity_over_between_scene"),
    "object accuracy": ("object_accuracy",),
}


def dig(d, path):
    for k in path:
        if not isinstance(d, dict) or k not in d:
            return None
        d = d[k]
    return d


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dirs", nargs="+",
                   help="directories each containing eval_summary.json")
    p.add_argument("--out_json", default=None)
    a = p.parse_args()

    rows = {}
    seeds = []
    for d in a.dirs:
        path = os.path.join(d, "eval_summary.json")
        with open(path) as f:
            s = json.load(f)
        seeds.append(d)
        for name, jpath in METRICS.items():
            v = dig(s, jpath)
            # Keep per-dir alignment even when a metric is missing from
            # some dirs: store dir->value so the JSON says which seed
            # produced which number (None = absent).
            rows.setdefault(name, {})[d] = (
                float(v) if v is not None else None)

    print(f"| metric | mean | std | min | max | n |")
    print(f"|---|---|---|---|---|---|")
    agg = {}
    for name, by_dir in rows.items():
        vals = [v for v in by_dir.values() if v is not None]
        if not vals:
            continue
        n = len(vals)
        mean = sum(vals) / n
        std = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1)) \
            if n > 1 else 0.0
        agg[name] = {"mean": mean, "std": std, "min": min(vals),
                     "max": max(vals), "n": n, "values": by_dir}
        print(f"| {name} | {mean:.4f} | {std:.4f} | {min(vals):.4f} "
              f"| {max(vals):.4f} | {n} |")

    if a.out_json:
        with open(a.out_json, "w") as f:
            json.dump({"dirs": seeds, "metrics": agg}, f, indent=1)
        print(f"\nwrote {a.out_json}")


if __name__ == "__main__":
    main()
