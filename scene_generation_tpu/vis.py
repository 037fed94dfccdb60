"""Visualization utilities (reference ``scene_generation/vis.py``).

``draw_layout``/``add_boxes_to_layout``/``draw_box`` render masks + boxes via
matplotlib (vis.py:31-131); ``draw_scene_graph`` emits graphviz source and
shells out to ``dot`` when available (vis.py:134-217), else returns the
source text.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np


def draw_layout(vocab, objs, boxes, masks=None, size=256,
                show_boxes: bool = False, bgcolor=(0, 0, 0)):
    """Render object masks into an RGB canvas (vis.py:31-60)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    cmap = plt.get_cmap("rainbow")
    colors = cmap(np.linspace(0, 1, len(objs)))

    canvas = np.zeros((size, size, 3), np.float32)
    canvas[:] = np.asarray(bgcolor, np.float32).reshape(1, 1, 3)
    for i, obj in enumerate(objs):
        name = _obj_name(vocab, int(obj))
        if name == "__image__":
            continue
        x0, y0, x1, y1 = np.clip(np.asarray(boxes[i], np.float64), 0, 1)
        px0, py0 = int(x0 * size), int(y0 * size)
        px1, py1 = max(int(x1 * size), px0 + 1), max(int(y1 * size), py0 + 1)
        color = colors[i, :3]
        if masks is None:
            canvas[py0:py1, px0:px1] = color
        else:
            m = np.asarray(masks[i], np.float32)
            import PIL.Image
            m = np.asarray(PIL.Image.fromarray((m * 255).astype(np.uint8))
                           .resize((px1 - px0, py1 - py0)), np.float32) / 255.0
            region = canvas[py0:py1, px0:px1]
            canvas[py0:py1, px0:px1] = (region * (1 - m[..., None])
                                        + m[..., None] * color)
    if show_boxes:
        canvas = add_boxes_to_layout(canvas, [
            _obj_name(vocab, int(o)) for o in objs], boxes, size)
    return (canvas * 255).astype(np.uint8)


def add_boxes_to_layout(canvas: np.ndarray, names: Sequence[str], boxes,
                        size: int) -> np.ndarray:
    """Overlay box outlines + labels (vis.py:83-103)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(size / 100, size / 100), dpi=100)
    ax.imshow(canvas if canvas.dtype == np.uint8
              else (canvas * 255).astype(np.uint8))
    for name, box in zip(names, boxes):
        if name == "__image__":
            continue
        x0, y0, x1, y1 = np.asarray(box, np.float64) * size
        ax.add_patch(plt.Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False,
                                   edgecolor="white", linewidth=1))
        ax.text(x0, y0, name, fontsize=6, color="white")
    ax.axis("off")
    fig.tight_layout(pad=0)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def scene_graph_source(vocab, objs, triples,
                       vocab_pred: Optional[List[str]] = None) -> str:
    """Graphviz digraph text for a scene graph (vis.py:134-209)."""
    lines = ["digraph{", '  graph [ratio="compress", margin="0"];',
             "  node [shape=box, style=filled];"]
    for i, obj in enumerate(objs):
        name = _obj_name(vocab, int(obj))
        lines.append(f'  o{i} [label="{name}", fillcolor="lightblue"];')
    preds = vocab_pred or vocab["pred_idx_to_name"]
    for k, (s, p, o) in enumerate(triples):
        pname = preds[int(p)]
        if pname == "__in_image__":
            continue
        lines.append(f'  p{k} [label="{pname}", fillcolor="lightyellow"];')
        lines.append(f"  o{int(s)} -> p{k} -> o{int(o)};")
    lines.append("}")
    return "\n".join(lines)


def draw_scene_graph(vocab, objs, triples, output_path: Optional[str] = None):
    """Render the graph with ``dot`` if installed (vis.py:210-217); returns
    the png path or the graphviz source if dot is unavailable."""
    src = scene_graph_source(vocab, objs, triples)
    dot = shutil.which("dot")
    if dot is None:
        return src
    with tempfile.NamedTemporaryFile("w", suffix=".dot",
                                     delete=False) as f:
        f.write(src)
        dot_path = f.name
    png = output_path or dot_path.replace(".dot", ".png")
    subprocess.run([dot, "-Tpng", dot_path, "-o", png], check=True)
    os.unlink(dot_path)
    return png


def _palette(c: int, colors: Optional[np.ndarray]) -> np.ndarray:
    """Seed-0 random palette shared by both one_hot_to_rgb variants."""
    if colors is not None:
        return colors
    return np.random.RandomState(0).randint(0, 256, (c, 3)).astype(np.float32)


def _normalize_rgb(rgb: np.ndarray) -> np.ndarray:
    maxv = rgb.max() or 1.0
    return (rgb * (255.0 / maxv)).astype(np.uint8)


def one_hot_to_rgb(layout_one_hot: np.ndarray,
                   colors: Optional[np.ndarray] = None) -> np.ndarray:
    """Layout channels -> random-color RGB (trainer.py:394-397); NHWC in."""
    colors = _palette(layout_one_hot.shape[-1], colors)
    rgb = np.einsum("nhwc,cd->nhwd", np.asarray(layout_one_hot, np.float32),
                    colors)
    return _normalize_rgb(rgb)


def one_hot_to_rgb_compact(layout_one_hot,
                           colors: Optional[np.ndarray] = None) -> np.ndarray:
    """``one_hot_to_rgb`` with the palette contraction done ON DEVICE.

    Identical math (same seed-0 palette, same max-normalization), but the
    C-channel layout never leaves the accelerator — only the (N, H, W, 3)
    projection transfers. At COCO scale that is ~70x less wire than
    pulling the raw one-hot (13.4 MB -> 0.2 MB per panel), which matters
    for TB logging over slow host links (train.py; RESULTS.md §24).
    """
    import jax.numpy as jnp
    colors = _palette(layout_one_hot.shape[-1], colors)
    rgb = np.asarray(jnp.einsum(
        "nhwc,cd->nhwd", jnp.asarray(layout_one_hot, jnp.float32),
        jnp.asarray(colors)))
    return _normalize_rgb(rgb)


def _obj_name(vocab, cls: int) -> str:
    table = vocab.get("my_idx_to_obj")
    if table and cls < len(table) and table[cls]:
        return table[cls]
    return str(cls)
