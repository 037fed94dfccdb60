"""Measure the REFERENCE model's torch forward on this host's CPU.

Anchors bench.py's analytic V100 baseline (BASELINE.md "derived baseline"):
imports the reference implementation from SGT_REFERENCE_DIR (default
/root/reference) at runtime — nothing is copied — no-ops its hard-coded
``.cuda()`` calls, and times the exact test-mode forward that
sample_images.py exercises, at reference-default architecture (128x128,
172 classes, 5 gconv layers). Also reports the per-image conv-FLOP count
measured via torch.profiler so the analytic FLOP model in bench.py can be
cross-checked against the real reference network rather than a hand count.

Usage: python scripts/baseline_torch.py [--batch 16] [--iters 3]
Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_DIR = os.environ.get("SGT_REFERENCE_DIR", "/root/reference")
N_OBJ = 172      # COCO-stuff vocab incl. __image__ (config.py num_objs)
NUM_ATTRS = 35   # 10 size + 25 location (config.py)


def build_reference_model():
    sys.path.insert(0, REF_DIR)
    import torch

    # The reference hard-codes CUDA (generators.py:54-56 asserts + .cuda(),
    # layout.py:203-204, bilinear.py:295-297). No-op the device moves so
    # the unmodified reference code runs on CPU for timing.
    torch.cuda.is_available = lambda: True
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self

    from scene_generation.model import Model

    vocab = {
        "object_to_idx": {f"c{i}": i for i in range(N_OBJ)},
        "object_idx_to_name": [f"c{i}" for i in range(N_OBJ)],
        "pred_idx_to_name": ["__in_image__", "left of", "right of",
                             "above", "below", "inside", "surrounding"],
        "num_attributes": NUM_ATTRS,
    }
    m = Model(vocab=vocab, image_size=(128, 128), embedding_dim=128,
              gconv_dim=128, gconv_hidden_dim=512, gconv_num_layers=5,
              mask_size=32, mlp_normalization="none",
              appearance_normalization="batch",
              activation="leakyrelu-0.2")
    m.eval()
    return m


def make_batch(torch, B, O=8):
    g = torch.Generator().manual_seed(0)
    total = B * O
    objs = torch.randint(1, N_OBJ, (total,), generator=g)
    xy = torch.rand(total, 2, generator=g) * 0.5
    wh = 0.1 + 0.3 * torch.rand(total, 2, generator=g)
    boxes = torch.cat([xy, (xy + wh).clamp(max=1.0)], 1)
    obj_to_img = torch.arange(B).repeat_interleave(O)
    triples = []
    for b in range(B):
        base = b * O
        for i in range(O - 1):
            triples.append([base + i, 1 + i % 6, base + i + 1])
    triples = torch.tensor(triples)
    attributes = torch.zeros(total, NUM_ATTRS)
    attributes[:, 3] = 1.0
    attributes[:, 10 + 12] = 1.0
    imgs = torch.zeros(B, 3, 128, 128)
    masks = (torch.rand(total, 32, 32, generator=g) > 0.5).float()
    return imgs, objs, boxes, masks, triples, obj_to_img, attributes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    a = ap.parse_args()

    import numpy as np
    import torch
    torch.set_num_threads(os.cpu_count() or 1)

    m = build_reference_model()
    n_params = sum(p.numel() for p in m.parameters())
    imgs, objs, boxes, masks, triples, obj_to_img, attrs = make_batch(
        torch, a.batch)

    def fwd():
        # Exact check_model invocation (reference train.py:92-94).
        return m(imgs, objs, triples, obj_to_img, boxes_gt=boxes,
                 masks_gt=masks, attributes=attrs, test_mode=True,
                 use_gt_box=True)

    with torch.no_grad():
        fwd()  # warm
        ts = []
        for _ in range(a.iters):
            t0 = time.perf_counter()
            fwd()
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))

        flops_per_img = None
        try:
            from torch.profiler import ProfilerActivity, profile
            with profile(activities=[ProfilerActivity.CPU],
                         with_flops=True) as prof:
                fwd()
            flops = sum(e.flops for e in prof.key_averages()
                        if e.flops is not None)
            flops_per_img = flops / a.batch
        except Exception as e:  # pragma: no cover
            print(f"# profiler flops unavailable: {e}", file=sys.stderr)

    out = {
        "reference_torch_cpu_ms_per_batch": round(dt * 1e3, 1),
        "reference_torch_cpu_img_per_sec": round(a.batch / dt, 3),
        "batch": a.batch,
        "torch_threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "params_M": round(n_params / 1e6, 2),
        "measured_gflop_per_img": (round(flops_per_img / 1e9, 2)
                                   if flops_per_img else None),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
