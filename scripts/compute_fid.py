"""Compute FID between two image directories.

In-framework replacement for the third-party TTUR TensorFlow script the
reference README points at (README.md:77-79):

    python scripts/compute_fid.py --real_dir <gt pngs> --fake_dir <samples>

Uses the flax InceptionV3 pool3 features (torchvision weights when
available; see models/inception.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def iter_image_batches(directory, batch_size, size=(299, 299)):
    import PIL.Image
    files = sorted(f for f in os.listdir(directory)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    batch = []
    for f in files:
        with PIL.Image.open(os.path.join(directory, f)) as im:
            arr = np.asarray(im.convert("RGB").resize(size[::-1]),
                             np.float32) / 255.0
        batch.append(arr * 2.0 - 1.0)
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real_dir", required=True)
    p.add_argument("--fake_dir", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (small image sets compile "
                        "faster than a remote-TPU round trip)")
    p.add_argument("--out_json", default=None)
    a = p.parse_args()

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from scene_generation_tpu.metrics_fid import FIDAccumulator
    fid = FIDAccumulator()
    n_real = n_fake = 0
    for batch in iter_image_batches(a.real_dir, a.batch_size):
        fid.add_real(batch)
        n_real += len(batch)
    for batch in iter_image_batches(a.fake_dir, a.batch_size):
        fid.add_fake(batch)
        n_fake += len(batch)
    score = fid.compute()
    print(f"FID({n_real} real, {n_fake} fake) = {score:.4f}")
    if a.out_json:
        import json
        with open(a.out_json, "w") as f:
            json.dump({"fid": score, "n_real": n_real, "n_fake": n_fake}, f)


if __name__ == "__main__":
    main()
