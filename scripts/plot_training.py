"""Render training curves for RESULTS.md from a training run's log.

Small-multiple line panels (each loss has its own scale — never a dual
axis), plus a train/val IoU panel. Colors are the dataviz reference
palette's categorical slots in fixed order (slot order is the documented
CVD-safe ordering; the palette ships pre-validated for light mode).

Usage: python scripts/plot_training.py --log runs/r2_main.log \
           --out runs/r2_main/curves.png

When the text log is gone (runs/r4_repl's was consumed by a pipe), the
tensorboard event file train.py also writes carries the same series
(`g_loss/<name>`, `checkpoint/val_gt_iou`, `checkpoint/val_sg_iou`):
       python scripts/plot_training.py --events runs/r4_repl \
           --out runs/r4_repl/curves.png
"""
import argparse
import re

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

# dataviz reference palette, light mode, fixed slot order.
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
INK = "#1a1a19"
MUTED = "#6f6e66"
GRID = "#e7e6e0"

PANELS = [
    ("total_loss", "Total generator loss"),
    ("g_vgg", "Perceptual (VGG) loss"),
    ("g_gan_img_loss", "G adversarial (image)"),
    ("ac_loss", "Auxiliary classifier"),
    ("g_gan_features_loss_img", "Feature matching (image)"),
    ("fake_image_loss", "D_img fake loss"),
]


def parse_log(path):
    text = open(path).read()
    steps = [int(s) for s in re.findall(r"^t = (\d+) /", text, re.M)]
    series = {}
    for name, _ in PANELS:
        vals = [float(v) for v in re.findall(
            rf"\[{re.escape(name)}\]: ([-\d.]+)", text)]
        series[name] = vals
    ious = re.findall(r"train iou: ([\d.]+)\s+val iou: ([\d.]+)", text)
    ious = [(float(t), float(v)) for t, v in ious]
    # IoU checkpoints land every checkpoint_every steps, in log order.
    return steps, series, ious, None


def parse_events(path):
    """Text-log-free fallback: read the tensorboardX event file train.py
    writes alongside checkpoints. TFRecord framing is parsed by hand
    (uint64 length + crc + payload + crc) so no tensorflow/tensorboard
    reader is needed; tensorboardX ships the Event proto.

    `path` may be the event file itself or the run dir containing it.
    """
    import glob
    import os
    import struct

    from tensorboardX.proto import event_pb2

    # train.py logs g_loss/* at index = t // print_every (reference
    # cadence); recover real steps via the run dir's args.json.
    print_every = 1
    if os.path.isdir(path):
        args_json = os.path.join(path, "args.json")
        if os.path.exists(args_json):
            import json
            print_every = json.load(open(args_json)).get("print_every", 1)
        else:
            print(f"WARNING: {args_json} missing; assuming print_every=1 — "
                  "the loss x-axis is wrong by the real print_every factor "
                  "if the run used a larger value")
        cands = sorted(glob.glob(os.path.join(path, "events.out.tfevents*")))
        if not cands:
            raise FileNotFoundError(f"no events.out.tfevents* under {path}")
    else:
        cands = [path]
    # A resumed run writes a NEW event file; merge all of them by
    # (tag, step), last write wins (dedupes the pre-restart overlap the
    # resumed leg re-emits).
    merged = {}  # tag -> {step: value}
    for fname in cands:
        with open(fname, "rb") as f:
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                (ln,) = struct.unpack("<Q", hdr)
                f.read(4)  # length crc (unchecked; file is local + trusted)
                payload = f.read(ln)
                f.read(4)  # payload crc
                if len(payload) < ln:
                    break  # truncated tail (writer killed mid-record)
                ev = event_pb2.Event()
                ev.ParseFromString(payload)
                for v in ev.summary.value:
                    if v.HasField("simple_value"):
                        merged.setdefault(v.tag, {})[ev.step] = v.simple_value
    scalars = {tag: sorted(by_step.items())
               for tag, by_step in merged.items()}
    loss_steps = [s * print_every
                  for s, _ in scalars.get("g_loss/total_loss", [])]
    series = {name: [v for _, v in scalars.get(f"g_loss/{name}", [])]
              for name, _ in PANELS}
    gt = scalars.get("checkpoint/val_gt_iou", [])
    sg = dict(scalars.get("checkpoint/val_sg_iou", []))
    ious = [(v, sg[s]) for s, v in gt if s in sg]
    iou_steps = [s for s, v in gt if s in sg]
    return loss_steps, series, ious, iou_steps


def style_axis(ax):
    ax.set_facecolor("white")
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.tick_params(colors=MUTED, labelsize=8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", default=None, help="training text log")
    p.add_argument("--events", default=None,
                   help="tensorboard event file or run dir (fallback when "
                        "the text log is lost)")
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint_every", type=int, default=2500)
    a = p.parse_args()
    if not a.log and not a.events:
        p.error("one of --log / --events is required")

    if a.log:
        steps, series, ious, iou_xs = parse_log(a.log)
    else:
        steps, series, ious, iou_xs = parse_events(a.events)
    fig, axes = plt.subplots(2, 4, figsize=(14, 6), facecolor="white")
    axes = axes.ravel()

    for i, (name, title) in enumerate(PANELS):
        ax = axes[i]
        vals = series.get(name, [])
        n = min(len(steps), len(vals))
        style_axis(ax)
        ax.plot(steps[:n], vals[:n], color=SERIES[0], linewidth=2)
        ax.set_title(title, fontsize=9, color=INK, loc="left")

    # IoU panel: two series -> slots 1/2 + legend.
    ax = axes[len(PANELS)]
    style_axis(ax)
    if ious:
        xs = iou_xs or [a.checkpoint_every * (i + 1)
                        for i in range(len(ious))]
        ax.plot(xs, [t for t, _ in ious], color=SERIES[0],
                linewidth=2, label="val-gt (GT attrs)")
        ax.plot(xs, [v for _, v in ious], color=SERIES[1],
                linewidth=2, label="val-sg (no attrs)")
        ax.legend(fontsize=8, frameon=False, labelcolor=MUTED)
    ax.set_title("Box IoU at checkpoints", fontsize=9, color=INK,
                 loc="left")

    for j in range(len(PANELS) + 1, len(axes)):
        axes[j].axis("off")
    for ax in axes[:len(PANELS) + 1]:
        ax.set_xlabel("step", fontsize=8, color=MUTED)

    fig.tight_layout()
    fig.savefig(a.out, dpi=140)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
