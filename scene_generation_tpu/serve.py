"""Programmatic batch inference server.

A JSON-over-HTTP serving surface complementing the interactive GUI
(scripts/gui/server.py keeps the reference's GET /get_data contract; this
endpoint is for production/batch callers):

  POST /generate
    {"scene_graphs": [ {objects, relationships, attributes, features,
                        image_id}, ... ]}
  ->
    {"images": ["<base64 png>", ...], "layouts": ["<base64 png>", ...],
     "boxes_pred": [[[x0,y0,x1,y1], ...], ...]}

  GET /healthz   -> {"status": "ok", "device": "...", "num_classes": N}
  GET /vocab     -> {"objects": [...], "predicates": [...]}

Run: python -m scene_generation_tpu.serve --output_dir <run> [--port 8001]

The model compiles once per scene-graph batch shape (the padded contract
keeps shapes static across requests with the same number of graphs).
"""
from __future__ import annotations

import argparse
import base64
import io
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def _png_b64(arr_uint8) -> str:
    import PIL.Image
    buf = io.BytesIO()
    PIL.Image.fromarray(arr_uint8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


class Server:
    def __init__(self, output_dir: str, checkpoint_name: str = "checkpoint",
                 features_path=None, best: bool = False):
        from scene_generation_tpu.api import InferenceModel
        self.model = InferenceModel.from_checkpoint(
            output_dir, checkpoint_name, best=best,
            features_path=features_path)

    def generate(self, payload: dict) -> dict:
        from scene_generation_tpu.data.image_utils import deprocess
        from scene_generation_tpu.vis import draw_layout
        graphs = payload["scene_graphs"]
        out, batch = self.model.forward_json(graphs)
        images, layouts, boxes = [], [], []
        for i in range(batch.num_images):
            images.append(_png_b64(deprocess(np.asarray(out.imgs_pred[i]))))
            o_real = int(batch.obj_mask[i].sum())
            layouts.append(_png_b64(draw_layout(
                self.model.vocab, batch.objs[i][:o_real],
                np.asarray(out.boxes_pred[i])[:o_real],
                np.asarray(out.masks_pred[i])[:o_real])))
            boxes.append(np.asarray(out.boxes_pred[i])[:o_real].tolist())
        return {"images": images, "layouts": layouts, "boxes_pred": boxes}

    def vocab(self) -> dict:
        v = self.model.vocab
        return {"objects": [n for n in v["my_idx_to_obj"]
                            if n and n != "__image__"],
                "predicates": v["pred_idx_to_name"]}

    def healthz(self) -> dict:
        import jax
        return {"status": "ok", "device": jax.default_backend(),
                "num_classes": self.model.cfg.model.num_objs}


def make_handler(server: Server):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._send(200, server.healthz())
            if self.path == "/vocab":
                return self._send(200, server.vocab())
            return self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                return self._send(404, {"error": "not found"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                return self._send(200, server.generate(payload))
            except Exception as e:
                return self._send(500, {"error": str(e)})

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint_name", default="checkpoint")
    p.add_argument("--features_path", default=None)
    p.add_argument("--best", type=int, default=0)
    p.add_argument("--port", type=int, default=8001)
    a = p.parse_args(argv)
    server = Server(a.output_dir, a.checkpoint_name, a.features_path,
                    bool(a.best))
    httpd = HTTPServer(("0.0.0.0", a.port), make_handler(server))
    print(f"serving on http://localhost:{a.port} "
          f"(POST /generate, GET /vocab, GET /healthz)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
