"""vis.py rendering tests (reference vis.py demos were eyeball-only)."""
import numpy as np

from scene_generation_tpu.data.synthetic import synthetic_vocab
from scene_generation_tpu.vis import (
    draw_layout, one_hot_to_rgb, scene_graph_source, draw_scene_graph)


def test_draw_layout_renders_masks():
    vocab = synthetic_vocab(6)
    objs = [1, 2, 0]  # last is __image__, must be skipped
    boxes = np.array([[.1, .1, .5, .5], [.5, .5, .9, .9], [0, 0, 1, 1]])
    masks = np.ones((3, 8, 8), np.float32)
    img = draw_layout(vocab, objs, boxes, masks, size=64)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert img[20, 20].sum() > 0          # object 1 region colored
    assert img[2, 60].sum() == 0          # background stays black


def test_draw_layout_with_boxes_overlay():
    vocab = synthetic_vocab(6)
    img = draw_layout(vocab, [1, 2], np.array([[.1, .1, .4, .4],
                                               [.6, .6, .9, .9]]),
                      None, size=64, show_boxes=True)
    assert img.shape[2] == 3


def test_scene_graph_source():
    vocab = synthetic_vocab(6)
    src = scene_graph_source(vocab, [1, 2, 0],
                             [[0, 1, 1], [0, 0, 2]])
    assert src.startswith("digraph")
    assert "class_1" in src and "class_2" in src
    assert "left of" in src
    assert "__in_image__" not in src  # in_image edges hidden


def test_draw_scene_graph_falls_back_without_dot(monkeypatch):
    import shutil
    monkeypatch.setattr(shutil, "which", lambda *_: None)
    vocab = synthetic_vocab(6)
    out = draw_scene_graph(vocab, [1, 2], [[0, 1, 1]])
    assert isinstance(out, str) and out.startswith("digraph")


def test_one_hot_to_rgb():
    layout = np.zeros((1, 8, 8, 4), np.float32)
    layout[0, :4, :, 1] = 1
    rgb = one_hot_to_rgb(layout)
    assert rgb.shape == (1, 8, 8, 3)
    assert rgb.max() == 255


def test_one_hot_to_rgb_compact_matches_host():
    from scene_generation_tpu.vis import one_hot_to_rgb_compact
    rng = np.random.RandomState(3)
    layout = rng.rand(2, 8, 8, 7).astype(np.float32)
    host = one_hot_to_rgb(layout)
    compact = one_hot_to_rgb_compact(layout)
    # Same palette, same normalization; f32 einsum on either side.
    assert np.abs(host.astype(int) - compact.astype(int)).max() <= 1


def test_plot_training_parse_events_round_trip(tmp_path):
    """plot_training's TB-event fallback (used when the text log is lost,
    e.g. runs/r4_repl) recovers the loss series at real step numbers
    (index * print_every from args.json) and the paired IoU checkpoints."""
    import importlib.util
    import json
    import os
    import sys

    from tensorboardX import SummaryWriter

    run = tmp_path / "run"
    run.mkdir()
    json.dump({"print_every": 100, "checkpoint_every": 200},
              open(run / "args.json", "w"))
    w = SummaryWriter(str(run))
    for i, v in enumerate([5.0, 4.0, 3.0]):
        w.add_scalar("g_loss/total_loss", v, i)
    w.add_scalar("checkpoint/val_gt_iou", 0.5, 200)
    w.add_scalar("checkpoint/val_sg_iou", 0.3, 200)
    w.add_scalar("checkpoint/val_gt_iou", 0.6, 400)
    w.add_scalar("checkpoint/val_sg_iou", 0.35, 400)
    w.close()

    spec = importlib.util.spec_from_file_location(
        "plot_training", os.path.join(
            os.path.dirname(__file__), "..", "scripts", "plot_training.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["plot_training"] = mod
    spec.loader.exec_module(mod)

    steps, series, ious, iou_xs = mod.parse_events(str(run))
    assert steps == [0, 100, 200]
    assert series["total_loss"] == [5.0, 4.0, 3.0]
    # simple_value is an f32 field: compare with f32 tolerance.
    assert np.allclose(ious, [(0.5, 0.3), (0.6, 0.35)], atol=1e-6)
    assert iou_xs == [200, 400]
