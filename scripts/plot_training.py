"""Render training curves for RESULTS.md from a training run's log.

Small-multiple line panels (each loss has its own scale — never a dual
axis), plus a train/val IoU panel. Colors are the dataviz reference
palette's categorical slots in fixed order (slot order is the documented
CVD-safe ordering; the palette ships pre-validated for light mode).

Usage: python scripts/plot_training.py --log runs/r2_main.log \
           --out runs/r2_main/curves.png
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
    # IoU checkpoints land every checkpoint_every steps, in log order.
    return steps, series, ious


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
    p.add_argument("--log", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint_every", type=int, default=2500)
    a = p.parse_args()

    steps, series, ious = parse_log(a.log)
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
        xs = [a.checkpoint_every * (i + 1) for i in range(len(ious))]
        ax.plot(xs, [float(t) for t, _ in ious], color=SERIES[0],
                linewidth=2, label="train (GT attrs)")
        ax.plot(xs, [float(v) for _, v in ious], color=SERIES[1],
                linewidth=2, label="val (no attrs)")
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
