"""High-level inference API: load a trained checkpoint and generate images
from batches or GUI-style JSON scene graphs.

Covers the reference's inference entry points: ``Model.encode_scene_graphs``
(model.py:174-250), ``forward_json`` (model.py:252-256) and the
checkpoint-rebuild pattern of ``scripts/sample_images.py:133-144``.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scene_generation_tpu.config import Config
from scene_generation_tpu.data.batching import Batch, Example, collate
from scene_generation_tpu.models.model import ModelOutput
from scene_generation_tpu.trainer.checkpoint import CheckpointManager
from scene_generation_tpu.trainer.train_state import (Modules, TrainState,
                                                      create_train_state)


class InferenceModel:
    """A restored SceneModel + vocab + (optional) clustered feature dicts."""

    def __init__(self, cfg: Config, vocab: Dict, mods: Modules,
                 state: TrainState,
                 features: Optional[Dict] = None,
                 features_one: Optional[Dict] = None):
        self.cfg = cfg
        self.vocab = vocab
        self.mods = mods
        self.state = state
        self.features = features        # class -> (k, rep) cluster centers
        self.features_one = features_one
        self._rng = jax.random.PRNGKey(0)
        self._fwd_cache = {}

    # --- construction -----------------------------------------------------
    @classmethod
    def from_checkpoint(cls, output_dir: str,
                        checkpoint_name: str = "checkpoint",
                        best: bool = False,
                        features_path: Optional[str] = None
                        ) -> "InferenceModel":
        ckpt = CheckpointManager(output_dir, checkpoint_name)
        meta = ckpt.load_meta()
        if meta is None:
            raise FileNotFoundError(f"no checkpoint meta under {ckpt.root}")
        cfg = Config.from_json(json.dumps(meta["config"]))
        vocab = meta["vocab"]
        from scene_generation_tpu.data.synthetic import synthetic_batch
        batch = synthetic_batch(cfg, seed=0, batch_size=1)
        mods, template = create_train_state(cfg, jax.random.PRNGKey(0),
                                            batch, load_vgg=False)
        state = ckpt.restore(template, best=best)
        if state is None:
            raise FileNotFoundError(f"no checkpoint state under {ckpt.root}")
        features = features_one = None
        if features_path:
            features = np.load(features_path, allow_pickle=True).item()
            one_path = features_path.replace("features_clustered_100",
                                             "features_clustered_001")
            if one_path != features_path and os.path.exists(one_path):
                features_one = np.load(one_path, allow_pickle=True).item()
        return cls(cfg, vocab, mods, state, features, features_one)

    # --- batch inference ---------------------------------------------------
    def forward_batch(self, batch: Batch, use_gt_boxes: bool = False,
                      use_gt_masks: bool = False,
                      use_gt_attributes: bool = False,
                      features: Optional[np.ndarray] = None,
                      features_mask: Optional[np.ndarray] = None,
                      rng: Optional[jax.Array] = None) -> ModelOutput:
        """Test-mode forward with the Figure-3 ablation switches
        (sample_images.py:41-48, README.md:84-94)."""
        mc = self.cfg.model
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        noise = jax.random.normal(rng, (mc.mask_noise_dim,))
        attributes = jnp.asarray(batch.attributes)
        if not use_gt_attributes:
            attributes = jnp.zeros_like(attributes)
        key = (use_gt_boxes, use_gt_masks, features is not None)
        if key not in self._fwd_cache:
            model = self.mods.model

            def fwd(state, objs, triples, attributes, obj_mask, triple_mask,
                    noise, imgs, boxes, masks, feats, feats_mask):
                return model.apply(
                    {"params": state.g_params,
                     "batch_stats": state.g_stats},
                    objs, triples, attributes, obj_mask, triple_mask, noise,
                    imgs=imgs, boxes_gt=boxes,
                    masks_gt=masks if use_gt_masks else None,
                    test_mode=True, use_gt_box=use_gt_boxes, train=False,
                    features=feats, features_mask=feats_mask)

            self._fwd_cache[key] = jax.jit(fwd)
        n, o = batch.objs.shape
        if features is None:
            feats = feats_mask = None
        else:
            feats = jnp.asarray(features, jnp.float32)
            feats_mask = (jnp.ones((n, o), jnp.float32)
                          if features_mask is None
                          else jnp.asarray(features_mask, jnp.float32))
        return self._fwd_cache[key](
            self.state, jnp.asarray(batch.objs), jnp.asarray(batch.triples),
            attributes, jnp.asarray(batch.obj_mask),
            jnp.asarray(batch.triple_mask), noise, jnp.asarray(batch.imgs),
            jnp.asarray(batch.boxes), jnp.asarray(batch.masks),
            feats, feats_mask)

    def sample_cluster_features(self, objs: np.ndarray, obj_mask: np.ndarray,
                                rng: np.random.RandomState
                                ) -> Tuple[np.ndarray, np.ndarray]:
        """Random per-class cluster feature per object
        (sample_images.py:210-215).

        Returns ``(features, features_mask)``: the mask is 1 only where a
        cluster entry actually exists, so objects with no entry fall back
        to the model's repr_net path (model.py:159-163) instead of having
        their appearance forced to zero. Raises like the reference
        (sample_images.py:170-174 ValueError) when no table was loaded.
        """
        if self.features is None:
            raise ValueError(
                "No features file: pass features_path (scripts/"
                "encode_features.py output) to sample appearance clusters")
        n, o = objs.shape
        rep = self.cfg.model.rep_size
        out = np.zeros((n, o, rep), np.float32)
        mask = np.zeros((n, o), np.float32)
        for i in range(n):
            for j in range(o):
                if obj_mask[i, j] == 0:
                    continue
                cls = int(objs[i, j])
                feats = self.features.get(cls)
                if feats is None or len(feats) == 0:
                    continue
                out[i, j] = feats[rng.randint(len(feats))]
                mask[i, j] = 1.0
        return out, mask

    # --- JSON scene graphs (GUI path) ---------------------------------------
    def encode_scene_graphs(self, scene_graphs, rand: bool = False):
        """GUI JSON dicts -> padded Batch + feature overrides.

        Input format (model.py:174-250): {"objects": [names], "relationships":
        [[s, pred_name, o]], "attributes": {"size": [...], "location": [...]},
        "features": [cluster indices, -1 = random-ish single cluster],
        "image_id": int}.
        """
        if isinstance(scene_graphs, dict):
            scene_graphs = [scene_graphs]
        dc, mc = self.cfg.data, self.cfg.model
        size_len = dc.size_attribute_len
        examples = []
        feats_list = []
        name_to_global = self.vocab["object_name_to_idx"]
        obj_to_idx = {int(k): v for k, v
                      in self.vocab["object_to_idx"].items()}
        pred_to_idx = self.vocab["pred_name_to_idx"]
        h, w = dc.image_size

        for sg in scene_graphs:
            names = list(sg["objects"]) + ["__image__"]
            # The __image__ node's appearance cluster is selected by the
            # GUI's image_id field — the background style (model.py:211).
            feature_ids = list(sg.get("features",
                                      [-1] * (len(names) - 1)))
            feature_ids = feature_ids + [int(sg.get("image_id", -1))]
            o = len(names)
            objs = np.asarray(
                [obj_to_idx[int(name_to_global[nm])] for nm in names],
                np.int32)
            attributes = np.zeros((o, dc.num_attributes), np.float32)
            for i, s in enumerate(sg.get("attributes", {}).get("size", [])):
                attributes[i, int(s)] = 1
            attributes[-1, size_len - 1] = 1
            for i, l in enumerate(sg.get("attributes", {}).get("location",
                                                               [])):
                attributes[i, size_len + int(l)] = 1
            attributes[-1, size_len + 12] = 1  # center cell (model.py:242)

            triples = []
            for s, p, o_idx in sg.get("relationships", []):
                triples.append([int(s), pred_to_idx[p], int(o_idx)])
            for i in range(o - 1):
                triples.append([i, pred_to_idx["__in_image__"], o - 1])

            feats = np.zeros((o, mc.rep_size), np.float32)
            fmask = np.zeros((o,), np.float32)
            for ind, (cls, fid) in enumerate(zip(objs, feature_ids)):
                table = self.features if self.features is not None else {}
                one = self.features_one or table
                cls = int(cls)
                if fid == -1 and cls in (one or {}):
                    feats[ind] = one[cls][0]
                    fmask[ind] = 1.0
                elif table and cls in table:
                    k = len(table[cls])
                    feats[ind] = table[cls][min(int(fid), k - 1)]
                    fmask[ind] = 1.0
                # No cluster entry (or no table at all): leave mask 0 so
                # the model's repr_net fallback supplies the appearance
                # (model.py:159-163) instead of a forced zero vector.
            feats_list.append((feats, fmask))

            examples.append(Example(
                image=np.zeros((h, w, 3), np.float32),
                objs=objs,
                boxes=np.tile(np.asarray([0, 0, 1, 1], np.float32), (o, 1)),
                masks=np.ones((o, dc.mask_size, dc.mask_size), np.float32),
                triples=np.asarray(triples, np.int32).reshape(-1, 3),
                attributes=attributes))

        batch = collate(examples, dc.max_objs, dc.max_triples)
        n = batch.num_images
        features = np.zeros((n, dc.max_objs, mc.rep_size), np.float32)
        features_mask = np.zeros((n, dc.max_objs), np.float32)
        for i, (f, fm) in enumerate(feats_list):
            features[i, :f.shape[0]] = f
            features_mask[i, :fm.shape[0]] = fm
        return batch, features, features_mask

    def forward_json(self, scene_graphs) -> Tuple[ModelOutput, Batch]:
        """Reference ``forward_json`` (model.py:252-256)."""
        batch, features, features_mask = self.encode_scene_graphs(
            scene_graphs)
        out = self.forward_batch(batch, use_gt_attributes=True,
                                 features=features,
                                 features_mask=features_mask)
        return out, batch
