"""Build per-class size/location attribute histograms (reference
``scripts/create_attributes_file.py:111-137``) -> ``attributes_10_25.pickle``
consumed by the datasets' attribute-sampling mode (coco.py:211-215)."""
import argparse
import os
import pickle
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--coco_dir", default="datasets/coco")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--save_path", default="models/attributes_10_25.pickle")
    p.add_argument("--size_attribute_len", type=int, default=10)
    p.add_argument("--grid_size", type=int, default=25)
    p.add_argument("--image_size", type=str, default="128,128")
    return p.parse_args()


def main():
    a = parse_args()
    size = tuple(int(x) for x in a.image_size.split(","))
    if a.synthetic:
        from scene_generation_tpu.config import Config
        from scene_generation_tpu.data.synthetic import SyntheticDataset
        dset = SyntheticDataset(Config(), size=a.num_samples or 128)
        vocab = dset.vocab
        name_of = lambda cls: vocab["my_idx_to_obj"][cls]
    else:
        from scene_generation_tpu.data.coco import CocoSceneGraphDataset
        dset = CocoSceneGraphDataset(
            image_dir=os.path.join(a.coco_dir, "images/train2017"),
            instances_json=os.path.join(
                a.coco_dir, "annotations/instances_train2017.json"),
            stuff_json=os.path.join(
                a.coco_dir, "annotations/stuff_train2017.json"),
            image_size=size, max_samples=a.num_samples,
            size_attribute_len=a.size_attribute_len, grid_size=a.grid_size)
        vocab = dset.vocab
        name_of = lambda cls: vocab["my_idx_to_obj"][cls]

    size_hist = defaultdict(lambda: np.zeros(a.size_attribute_len))
    loc_hist = defaultdict(lambda: np.zeros(a.grid_size))
    n = len(dset)
    for i in range(n):
        ex = dset[i]
        for j in range(len(ex.objs)):
            cls = int(ex.objs[j])
            if cls == 0:
                continue
            name = name_of(cls)
            size_hist[name] += ex.attributes[j, :a.size_attribute_len]
            loc_hist[name] += ex.attributes[j, a.size_attribute_len:]

    # Laplace-smooth so sampling never sees an all-zero distribution.
    attributes = {
        "size": {k: (v + 1).tolist() for k, v in size_hist.items()},
        "location": {k: (v + 1).tolist() for k, v in loc_hist.items()},
    }
    os.makedirs(os.path.dirname(a.save_path) or ".", exist_ok=True)
    with open(a.save_path, "wb") as f:
        pickle.dump(attributes, f)
    print(f"wrote {a.save_path} ({len(size_hist)} classes over {n} images)")


if __name__ == "__main__":
    main()
