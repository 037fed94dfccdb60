"""Integration tests: train a tiny checkpoint, then exercise the full
inference stack — InferenceModel, forward_json, sample_images,
encode_features, create_attributes_file, and the GUI HTTP server."""
import json
import os
import sys
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scene_generation_tpu.train import main as train_main


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("run"))
    train_main(["--synthetic", "--tiny", "--num_iterations", "2",
                "--print_every", "10", "--checkpoint_every", "2",
                "--output_dir", d, "--synthetic_size", "16"])
    return d


@pytest.fixture(scope="module")
def model(ckpt_dir):
    from scene_generation_tpu.api import InferenceModel
    return InferenceModel.from_checkpoint(ckpt_dir)


def test_forward_batch_ablations(model):
    from scene_generation_tpu.data.synthetic import synthetic_batch
    batch = synthetic_batch(model.cfg, seed=3, batch_size=2)
    out = model.forward_batch(batch, use_gt_boxes=True, use_gt_masks=True,
                              use_gt_attributes=True)
    h, w = model.cfg.model.image_size
    assert out.imgs_pred.shape == (2, h, w, 3)
    assert np.isfinite(np.asarray(out.imgs_pred)).all()


def test_forward_json(model):
    sg = {"objects": ["class_1", "class_2", "class_3"],
          "relationships": [[0, "left of", 1], [1, "above", 2]],
          "attributes": {"size": [4, 5, 3], "location": [6, 12, 18]},
          "features": [-1, -1, -1], "image_id": 0}
    out, batch = model.forward_json(sg)
    assert out.imgs_pred.shape[0] == 1
    assert np.isfinite(np.asarray(out.imgs_pred)).all()
    # 3 objects + __image__ are marked valid.
    assert int(batch.obj_mask[0].sum()) == 4


def test_sample_images_cli(ckpt_dir, tmp_path):
    from scripts.sample_images import main as sample_main
    save = str(tmp_path / "samples")
    old = sys.argv
    # --use_gt_textures: texture sampling without a features file raises
    # (reference sample_images.py:170-174 ValueError), so the hermetic
    # smoke uses GT appearance.
    sys.argv = ["sample_images.py", "--output_dir", ckpt_dir, "--synthetic",
                "--batch_size", "2", "--num_samples", "2", "--save_dir",
                save, "--use_gt_boxes", "1", "--use_gt_masks", "1",
                "--use_gt_textures", "1"]
    try:
        sample_main()
    finally:
        sys.argv = old
    files = os.listdir(save)
    assert "results.json" in files
    assert any(f.endswith("_pred.png") for f in files)
    assert any(f.endswith("_layout.png") for f in files)
    results = json.load(open(os.path.join(save, "results.json")))
    assert 0.0 <= results["avg_iou"] <= 1.0


def test_encode_features_cli(ckpt_dir):
    from scripts.encode_features import main as encode_main
    old = sys.argv
    sys.argv = ["encode_features.py", "--output_dir", ckpt_dir,
                "--synthetic", "--num_samples", "8", "--batch_size", "2"]
    try:
        encode_main()
    finally:
        sys.argv = old
    feats = np.load(os.path.join(ckpt_dir, "features.npy"),
                    allow_pickle=True).item()
    assert len(feats) > 0
    c100 = np.load(os.path.join(ckpt_dir, "features_clustered_100.npy"),
                   allow_pickle=True).item()
    for cls, centers in c100.items():
        assert centers.shape[1] == 4  # tiny rep_size


def test_create_attributes_cli(tmp_path):
    from scripts.create_attributes_file import main as attr_main
    path = str(tmp_path / "attributes_10_25.pickle")
    old = sys.argv
    sys.argv = ["create_attributes_file.py", "--synthetic",
                "--num_samples", "8", "--save_path", path]
    try:
        attr_main()
    finally:
        sys.argv = old
    import pickle
    attrs = pickle.load(open(path, "rb"))
    assert set(attrs.keys()) == {"size", "location"}
    for v in attrs["size"].values():
        assert len(v) == 10


def test_gui_server(ckpt_dir):
    from scripts.gui.server import GuiBackend, make_handler
    from http.server import HTTPServer

    backend = GuiBackend(ckpt_dir, "checkpoint", None,
                         os.path.join(ckpt_dir, "gui_images"))
    server = HTTPServer(("127.0.0.1", 0), make_handler(backend))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/vocab", timeout=30) as r:
            vocab = json.loads(r.read())
        assert len(vocab["objects"]) > 0

        scene = {"image_id": 0, "objects": [
            {"text": "class_1", "left": .1, "top": .1, "width": .3,
             "height": .3, "size": 4, "location": 6, "feature": -1},
            {"text": "class_2", "left": .5, "top": .5, "width": .3,
             "height": .3, "size": 5, "location": 18, "feature": -1},
            {"text": "class_3", "left": .2, "top": .6, "width": .2,
             "height": .2, "size": 3, "location": 16, "feature": -1}]}
        q = urllib.parse.quote(json.dumps(scene))
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/get_data?data={q}",
                timeout=300) as r:
            resp = json.loads(r.read())
        assert "img_pred" in resp and "img_layout" in resp
        img_abs = os.path.join(os.path.dirname(
            sys.modules["scripts.gui.server"].__file__), resp["img_pred"])
        assert os.path.exists(img_abs)

        # PROBE: malformed scene JSON -> HTTP 500 with error body, no crash.
        bad = urllib.parse.quote("{not json")
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/get_data?data={bad}", timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 500
        assert raised
    finally:
        server.shutdown()


def test_batch_serving_api(ckpt_dir):
    """POST /generate JSON contract (scene_generation_tpu/serve.py)."""
    import base64
    from http.server import HTTPServer
    from scene_generation_tpu.serve import Server, make_handler

    srv = Server(ckpt_dir)
    httpd = HTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        h = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30).read())
        assert h["status"] == "ok"
        payload = json.dumps({"scene_graphs": [{
            "objects": ["class_1", "class_2", "class_3"],
            "relationships": [[0, "left of", 1]],
            "attributes": {"size": [4, 5, 3], "location": [6, 12, 18]},
            "features": [-1, -1, -1], "image_id": 0}]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=payload,
            headers={"Content-Type": "application/json"})
        r = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert base64.b64decode(r["images"][0])[:4] == b"\x89PNG"
        assert len(r["boxes_pred"][0]) == 4  # 3 objects + __image__
    finally:
        httpd.shutdown()
