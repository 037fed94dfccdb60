"""Interactive scene-editing GUI server.

Same HTTP contract as the reference (``scripts/gui/simple-server.py:12-45``):
  GET /                      -> index.html
  GET /get_data?data=<json>  -> JSON {img_pred, img_layout} image paths
  GET /images/...            -> generated images / static assets

The scene JSON is the reference format (gui/model.py:111-180): objects with
left/top/width/height in [0,1], 'size' (0-9), 'location' (0-24), 'feature'
cluster index, converted to a consecutive-object relation chain via the same
geometric predicate + margin-box rules.

Run:  python scripts/gui/server.py --output_dir <train_output_dir> \\
          [--features_path .../features_clustered_100.npy] [--port 8000]
"""
import argparse
import json
import math
import os
import sys
import time
import urllib.parse
from http.server import HTTPServer, SimpleHTTPRequestHandler

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

GUI_DIR = os.path.dirname(os.path.abspath(__file__))


def json_to_scene_graph(json_text: str):
    """Reference ``json_to_scene_graph`` (gui/model.py:111-180): chain of
    relations between consecutive objects; boxes shrunk to size-margin
    squares around their centers before the predicate test."""
    scene = json.loads(json_text)
    if not scene:
        return []
    image_id = scene.get("image_id", 0)
    objs = scene["objects"]
    objects = [o["text"] for o in objs]
    relationships, size, location, features = [], [], [], []
    for i, obj_s in enumerate(objs):
        sx0, sy0 = obj_s["left"], obj_s["top"]
        sx1, sy1 = sx0 + obj_s["width"], sy0 + obj_s["height"]
        margin = (obj_s["size"] + 1) / 10 / 2
        mx, my = 0.5 * (sx0 + sx1), 0.5 * (sy0 + sy1)
        sx0, sx1 = max(0, mx - margin), min(1, mx + margin)
        sy0, sy1 = max(0, my - margin), min(1, my + margin)
        size.append(obj_s["size"])
        location.append(obj_s["location"])
        features.append(obj_s.get("feature", -1))
        if i == len(objs) - 1:
            continue
        obj_o = objs[i + 1]
        ox0, oy0 = obj_o["left"], obj_o["top"]
        ox1, oy1 = ox0 + obj_o["width"], oy0 + obj_o["height"]
        mxo, myo = 0.5 * (ox0 + ox1), 0.5 * (oy0 + oy1)
        theta = math.atan2(my - myo, mx - mxo)
        margin_o = (obj_o["size"] + 1) / 10 / 2
        ox0, ox1 = max(0, mxo - margin_o), min(1, mxo + margin_o)
        oy0, oy1 = max(0, myo - margin_o), min(1, myo + margin_o)
        if sx0 < ox0 and sx1 > ox1 and sy0 < oy0 and sy1 > oy1:
            p = "surrounding"
        elif sx0 > ox0 and sx1 < ox1 and sy0 > oy0 and sy1 < oy1:
            p = "inside"
        elif theta >= 3 * math.pi / 4 or theta <= -3 * math.pi / 4:
            p = "left of"
        elif -3 * math.pi / 4 <= theta < -math.pi / 4:
            p = "above"
        elif -math.pi / 4 <= theta < math.pi / 4:
            p = "right of"
        else:
            p = "below"
        relationships.append([i, p, i + 1])
    return [{"objects": objects, "relationships": relationships,
             "attributes": {"size": size, "location": location},
             "features": features, "image_id": image_id}]


class GuiBackend:
    def __init__(self, output_dir, checkpoint_name, features_path,
                 images_dir):
        from scene_generation_tpu.api import InferenceModel
        self.model = InferenceModel.from_checkpoint(
            output_dir, checkpoint_name, features_path=features_path)
        self.images_dir = images_dir
        os.makedirs(images_dir, exist_ok=True)

    def json_to_img(self, json_text: str):
        """gui/model.py:63-102: run forward_json, save image + layout."""
        from scene_generation_tpu.data.image_utils import deprocess
        from scene_generation_tpu.vis import draw_layout
        import PIL.Image

        scene_graphs = json_to_scene_graph(json_text)
        if not scene_graphs:
            return None, None
        out, batch = self.model.forward_json(scene_graphs)
        stamp = time.strftime("%b%d_%H-%M-%S")
        img_path = os.path.join(self.images_dir, f"img{stamp}.png")
        PIL.Image.fromarray(
            deprocess(np.asarray(out.imgs_pred[0]))).save(img_path)

        o_real = int(batch.obj_mask[0].sum())
        layout = draw_layout(self.model.vocab, batch.objs[0][:o_real],
                             np.asarray(out.boxes_pred[0])[:o_real],
                             np.asarray(out.masks_pred[0])[:o_real],
                             show_boxes=True)
        layout_path = os.path.join(self.images_dir, f"img_layout{stamp}.png")
        PIL.Image.fromarray(layout).save(layout_path)
        rel = os.path.relpath
        return rel(img_path, GUI_DIR), rel(layout_path, GUI_DIR)


def make_handler(backend):
    class Handler(SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=GUI_DIR, **kw)

        def do_GET(self):
            if self.path.startswith("/get_data"):
                query = urllib.parse.urlparse(self.path).query
                data = urllib.parse.parse_qs(query).get("data", [""])[0]
                try:
                    img, layout = backend.json_to_img(data)
                    body = json.dumps(
                        {"img_pred": img, "img_layout": layout}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                except Exception as e:  # surface errors to the client
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/vocab":
                vocab = backend.model.vocab
                names = [n for n in vocab["my_idx_to_obj"]
                         if n and n != "__image__"]
                # Grouped menu (replaces the reference's separate
                # index_panoptic.html page, which is the same app with a
                # panoptic category menu baked in): the vocab's
                # instance/stuff split drives <optgroup>s client-side, so
                # one page serves instances-trained AND panoptic-trained
                # checkpoints.
                payload = {"objects": names}
                things = set(vocab.get("instance") or [])
                stuff = set(vocab.get("stuff") or [])
                if things or stuff:
                    payload["groups"] = {
                        "things": sorted(n for n in names if n in things),
                        "stuff": sorted(n for n in names if n in stuff),
                        "other": sorted(n for n in names
                                        if n not in things
                                        and n not in stuff),
                    }
                body = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/":
                self.path = "/index.html"
            return super().do_GET()

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint_name", default="checkpoint")
    p.add_argument("--features_path", default=None)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (same escape hatch as "
                        "sample_images/compute_fid/compute_diversity)")
    a = p.parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    backend = GuiBackend(a.output_dir, a.checkpoint_name, a.features_path,
                         os.path.join(GUI_DIR, "images", "outputs"))
    server = HTTPServer(("0.0.0.0", a.port), make_handler(backend))
    print(f"GUI server on http://localhost:{a.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
