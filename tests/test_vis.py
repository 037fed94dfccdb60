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
