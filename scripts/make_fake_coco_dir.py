"""Materialize an on-disk COCO-layout dataset from the fake-COCO generator.

Produces the EXACT directory layout train.py / eval_run.py expect from a
real COCO download (scripts/download_coco.sh):

    <root>/images/train2017/*.jpg
    <root>/images/val2017/*.jpg
    <root>/annotations/instances_{train,val}2017.json
    <root>/annotations/stuff_{train,val}2017.json
    <root>/annotations/panoptic_{train,val}2017.json      (--is_panoptic 1)
    <root>/annotations/panoptic_coco_categories.json
    <root>/panoptic/annotations/panoptic_{train,val}2017/*.png

so the full real-data command sequence (JPEG decode -> RLE -> padded
batches -> jitted step -> checkpoint -> eval pipeline) can be rehearsed
end-to-end on a host with no COCO access (RESULTS.md "full-fidelity
rehearsal"). Images/annotations come from data/fake_coco.make_fake_coco
(polygon + compressed/uncompressed RLE segmentations).

Usage: python scripts/make_fake_coco_dir.py --root /tmp/fake_coco \
           [--num_train 96] [--num_val 24] [--size 480,360]
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scene_generation_tpu.data.fake_coco import make_fake_coco  # noqa: E402


def build(root: str, num_train: int, num_val: int, size) -> None:
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    for split, n, seed in (("train2017", num_train, 0),
                           ("val2017", num_val, 1)):
        tmp = os.path.join(root, f"_tmp_{split}")
        paths = make_fake_coco(tmp, num_images=n, image_size=size, seed=seed)
        dst_img = os.path.join(root, "images", split)
        if os.path.isdir(dst_img):
            shutil.rmtree(dst_img)
        os.makedirs(os.path.dirname(dst_img), exist_ok=True)
        shutil.move(paths["image_dir"], dst_img)
        shutil.move(paths["instances_json"],
                    os.path.join(root, "annotations",
                                 f"instances_{split}.json"))
        shutil.move(paths["stuff_json"],
                    os.path.join(root, "annotations", f"stuff_{split}.json"))
        # Panoptic variant of the same scenes (train.py --is_panoptic 1).
        shutil.move(paths["panoptic_json"],
                    os.path.join(root, "annotations",
                                 f"panoptic_{split}.json"))
        dst_pan = os.path.join(root, "panoptic", "annotations",
                               f"panoptic_{split}")
        if os.path.isdir(dst_pan):
            shutil.rmtree(dst_pan)
        os.makedirs(os.path.dirname(dst_pan), exist_ok=True)
        shutil.move(paths["panoptic_dir"], dst_pan)
        shutil.move(paths["panoptic_categories"],
                    os.path.join(root, "annotations",
                                 "panoptic_coco_categories.json"))
        shutil.rmtree(tmp)
    print(f"fake COCO layout ready under {root}: "
          f"{num_train} train / {num_val} val images")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--num_train", type=int, default=96)
    p.add_argument("--num_val", type=int, default=24)
    p.add_argument("--size", default="480,360",
                   help="on-disk JPEG size W,H (decode-representative)")
    a = p.parse_args()
    w, h = (int(x) for x in a.size.split(","))
    build(a.root, a.num_train, a.num_val, (w, h))


if __name__ == "__main__":
    main()
