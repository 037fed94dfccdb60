"""Diversity metric (reference protocol #3, README.md:81 ->
richzhang/PerceptualSimilarity): mean LPIPS distance between pairs of
images generated from the SAME scene graph with independently sampled
appearance features.

For each val scene the model runs twice in test mode with two independent
per-class cluster feature draws (the same randomness sample_images.py uses
for non-GT textures); diversity = mean +- std of LPIPS over scenes.

Without pretrained VGG16/LPIPS-lin weights (scripts/fetch_pretrained.py)
the distance runs on random features with uniform lin weights — values are
then comparable only within a run (relative diversity), mirroring the IS
fallback policy.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", default="output")
    p.add_argument("--checkpoint_name", default="checkpoint")
    p.add_argument("--best", type=int, default=0)
    p.add_argument("--features_path", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--coco_dir", default="datasets/coco")
    # build_loader (scripts/sample_images.py) reads these in coco mode.
    p.add_argument("--sample_attributes", type=int, default=0)
    p.add_argument("--test_part", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_json", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="run on the host CPU (same escape hatch as "
                        "compute_fid.py; remote-TPU compiles of the VGG16 "
                        "feature net can be slow/flaky over the tunnel)")
    return p.parse_args()


def main():
    a = parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from scene_generation_tpu.api import InferenceModel
    from scene_generation_tpu.metrics_lpips import create_lpips_fn
    from scripts.sample_images import build_loader

    model = InferenceModel.from_checkpoint(
        a.output_dir, a.checkpoint_name, best=bool(a.best),
        features_path=a.features_path)
    loader = build_loader(model, a)
    lpips_fn, loaded = create_lpips_fn()
    if not loaded:
        print("WARNING: no VGG16/LPIPS weights found; diversity values are "
              "relative-only (random-feature LPIPS). Install via "
              "scripts/fetch_pretrained.py.")
    rng = np.random.RandomState(a.seed)

    dists = []
    baseline = []  # between-DIFFERENT-scene LPIPS: scale anchor for the
    #                relative-only fallback (diversity/baseline is unitless)
    for batch in loader:
        if len(dists) >= a.num_samples:
            break
        f1, m1 = model.sample_cluster_features(batch.objs, batch.obj_mask,
                                               rng)
        f2, m2 = model.sample_cluster_features(batch.objs, batch.obj_mask,
                                               rng)
        out1 = model.forward_batch(batch, features=f1, features_mask=m1)
        out2 = model.forward_batch(batch, features=f2, features_mask=m2)
        d = lpips_fn(out1.imgs_pred, out2.imgs_pred)
        dists.extend(np.asarray(d).tolist())
        b = lpips_fn(out1.imgs_pred, np.roll(np.asarray(out1.imgs_pred),
                                             1, axis=0))
        baseline.extend(np.asarray(b).tolist())
    dists = np.asarray(dists[:a.num_samples])
    baseline = np.asarray(baseline[:a.num_samples])
    result = {"diversity_lpips_mean": float(dists.mean()),
              "diversity_lpips_std": float(dists.std()),
              "between_scene_lpips_mean": float(baseline.mean()),
              "diversity_over_between_scene": float(
                  dists.mean() / max(baseline.mean(), 1e-12)),
              "n": int(dists.size), "pretrained": bool(loaded)}
    print(json.dumps(result))
    if a.out_json:
        with open(a.out_json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
