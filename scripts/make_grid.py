"""Assemble a labeled image grid (GT / predicted / layout rows) from a
sample_images.py output directory, for RESULTS.md."""
import argparse
import os

import numpy as np
import PIL.Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--rows", default="gt,pred,layout",
                   help="comma list of suffixes to stack as rows")
    a = p.parse_args()

    rows = a.rows.split(",")
    stems = sorted({f.rsplit("_", 1)[0] for f in os.listdir(a.samples_dir)
                    if f.endswith(".png")})[:a.n]
    grid_rows = []
    for suffix in rows:
        tiles = []
        for s in stems:
            path = os.path.join(a.samples_dir, f"{s}_{suffix}.png")
            if not os.path.isfile(path):
                continue
            im = PIL.Image.open(path).convert("RGB")
            if im.size != (128, 128):
                im = im.resize((128, 128))
            tiles.append(np.asarray(im))
        if tiles:
            grid_rows.append(np.concatenate(tiles, axis=1))
    grid = np.concatenate(grid_rows, axis=0)
    PIL.Image.fromarray(grid).save(a.out)
    print(f"wrote {a.out} ({grid.shape[1]}x{grid.shape[0]}, "
          f"{len(grid_rows)} rows x {len(stems)} cols)")


if __name__ == "__main__":
    main()
