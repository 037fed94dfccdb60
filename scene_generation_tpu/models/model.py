"""The generator umbrella model (flax).

Reference: ``scene_generation/model.py:12-172`` (``Model``). Wires:
embeddings -> scene-graph conv stack -> box MLP / mask upsampler /
appearance encoder + repr MLP -> layout compositor -> pix2pixHD generator.

Padded-batch contract (replaces flat ragged tensors + obj_to_img):
  objs         (N, O)   int32 class ids (0 also pads; see obj_mask)
  triples      (N, T, 3) int32 local [s, p, o]
  attributes   (N, O, A) float  size+location one-hots
  obj_mask     (N, O)   1.0 for real object slots
  triple_mask  (N, T)   1.0 for real triples
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from scene_generation_tpu.config import ModelConfig
from scene_generation_tpu.models.generators import (
    AppearanceEncoder, GlobalGenerator, MaskNet)
from scene_generation_tpu.models.graph import GraphTripleConv, GraphTripleConvNet
from scene_generation_tpu.models.layers import MLP
from scene_generation_tpu.ops.crop import crop_bbox_batch
from scene_generation_tpu.ops.layout import masks_to_layout


class ModelOutput(NamedTuple):
    imgs_pred: jax.Array                  # (N, H, W, 3)
    boxes_pred: jax.Array                 # (N, O, 4)
    masks_pred: jax.Array                 # (N, O, M, M)
    layout: Optional[jax.Array]           # GT layout (train) (N, H, W, C)
    layout_pred: jax.Array                # predicted-mask layout
    layout_wrong: Optional[jax.Array]     # wrong-texture layout (train)
    obj_repr: jax.Array                   # (N, O, rep_size) appearance vecs


class SceneModel(nn.Module):
    """Reference ``Model`` (model.py:12-124) on the padded contract."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self,
                 objs: jax.Array,
                 triples: jax.Array,
                 attributes: jax.Array,
                 obj_mask: jax.Array,
                 triple_mask: jax.Array,
                 mask_noise: jax.Array,
                 imgs: Optional[jax.Array] = None,
                 boxes_gt: Optional[jax.Array] = None,
                 masks_gt: Optional[jax.Array] = None,
                 test_mode: bool = False,
                 use_gt_box: bool = False,
                 features: Optional[jax.Array] = None,
                 features_mask: Optional[jax.Array] = None,
                 wrong_rep: Optional[jax.Array] = None,
                 train: bool = True) -> ModelOutput:
        """
        Args mirror reference ``Model.forward`` (model.py:94-124); extras:
          mask_noise: (mask_noise_dim,) — ONE noise vector shared by every
            object in the batch (reference quirk, model.py:149-152).
          features / features_mask: (N, O, rep_size) user/cluster appearance
            vectors and which rows they override (inference; model.py:159-163).
          wrong_rep: (N, O, rep_size) appearance vectors from the host-side
            VectorPool for the "wrong texture" negative (model.py:170).
        """
        cfg = self.cfg
        n, o = objs.shape
        h, w = cfg.image_size

        obj_vecs, _ = self._scene_graph_to_vectors(
            objs, triples, attributes, triple_mask, train)

        # --- create_components_vecs (model.py:145-172) ---
        box_vecs = obj_vecs
        noise = jnp.broadcast_to(mask_noise.astype(obj_vecs.dtype),
                                 (n, o, cfg.mask_noise_dim))
        mask_vecs = jnp.concatenate([obj_vecs, noise], axis=-1)  # (N,O,192)

        flat_w = obj_mask.reshape(n * o)
        repr_net = MLP((cfg.g_mask_dim, cfg.rep_hidden_size, cfg.rep_size),
                       batch_norm=cfg.mlp_normalization, name="repr_net")
        encoder = AppearanceEncoder(arch=cfg.appearance_arch,
                                    vecs_size=cfg.g_mask_dim,
                                    normalization=cfg.appearance_normalization,
                                    activation=cfg.activation,
                                    name="image_encoder")
        if features is None:
            # Training: encode GT crops (model.py:156-157).
            crops = crop_bbox_batch(imgs, boxes_gt, cfg.object_size)
            flat = crops.reshape(n * o, cfg.object_size, cfg.object_size, 3)
            enc = encoder(flat, train=train, weights=flat_w)
            obj_repr = repr_net(enc, train=train,
                                weights=flat_w).reshape(n, o, cfg.rep_size)
        else:
            # Inference: repr from mask_vecs, overridden by given features
            # (model.py:159-163).
            obj_repr = repr_net(mask_vecs.reshape(n * o, -1), train=False
                                ).reshape(n, o, cfg.rep_size)
            if features_mask is None:
                features_mask = jnp.ones((n, o), obj_repr.dtype)
            fm = features_mask[..., None].astype(obj_repr.dtype)
            obj_repr = fm * features.astype(obj_repr.dtype) + (1 - fm) * obj_repr

        one_hot = jax.nn.one_hot(objs, cfg.num_objs, dtype=obj_repr.dtype)
        layout_vecs = jnp.concatenate([one_hot, obj_repr], axis=-1)

        # --- boxes (model.py:103) + masks (model.py:106-107) ---
        boxes_pred = MLP((cfg.box_dim, cfg.gconv_hidden_dim, 4),
                         batch_norm=cfg.mlp_normalization, name="box_net")(
                             box_vecs, train=train)
        mask_logits = MaskNet(dim=cfg.g_mask_dim, mask_size=cfg.mask_size,
                              name="mask_net")(
            mask_vecs.reshape(n * o, cfg.g_mask_dim), train=train,
            weights=flat_w)
        masks_pred = jax.nn.sigmoid(mask_logits).reshape(
            n, o, cfg.mask_size, cfg.mask_size)

        generator = GlobalGenerator(
            output_nc=cfg.output_nc, ngf=cfg.ngf,
            n_downsampling=cfg.n_downsample_global,
            n_blocks=cfg.n_blocks_global, name="layout_to_image")

        if test_mode:
            boxes = boxes_gt if use_gt_box else boxes_pred
            masks = masks_gt if masks_gt is not None else masks_pred
            layout_pred = masks_to_layout(layout_vecs, boxes, masks, obj_mask,
                                          h, w, test_mode=True)
            imgs_pred = generator(layout_pred)
            return ModelOutput(imgs_pred, boxes_pred, masks_pred, None,
                               layout_pred, None, obj_repr)

        # Train: image is generated from the GT layout; predicted boxes and
        # masks train only through their own losses (model.py:119-123).
        layout = masks_to_layout(layout_vecs, boxes_gt, masks_gt, obj_mask,
                                 h, w, test_mode=False)
        layout_pred = masks_to_layout(layout_vecs, boxes_gt, masks_pred,
                                      obj_mask, h, w, test_mode=False)
        if wrong_rep is None:
            wrong_rep = obj_repr
        wrong_vecs = jnp.concatenate(
            [one_hot, wrong_rep.astype(obj_repr.dtype)], axis=-1)
        layout_wrong = masks_to_layout(wrong_vecs, boxes_gt, masks_gt,
                                       obj_mask, h, w, test_mode=False)
        imgs_pred = generator(layout)
        return ModelOutput(imgs_pred, boxes_pred, masks_pred, layout,
                           layout_pred, layout_wrong, obj_repr)

    def _scene_graph_to_vectors(self, objs, triples, attributes, triple_mask,
                                train):
        """Reference ``scene_graph_to_vectors`` (model.py:126-143)."""
        cfg = self.cfg
        p = triples[..., 1]
        edges = jnp.stack([triples[..., 0], triples[..., 2]], axis=-1)

        obj_vecs = nn.Embed(cfg.num_objs, cfg.embedding_dim,
                            name="obj_embeddings")(objs)
        pred_vecs = nn.Embed(cfg.num_preds, cfg.embedding_dim,
                             name="pred_embeddings")(p)
        attributes_dim = 0
        if cfg.use_attributes:
            attributes_dim = cfg.num_attributes
            obj_vecs = jnp.concatenate(
                [obj_vecs, attributes.astype(obj_vecs.dtype)], axis=-1)

        if cfg.gconv_num_layers == 0:
            obj_vecs = nn.Dense(cfg.gconv_dim, name="gconv_linear")(obj_vecs)
        else:
            obj_vecs, pred_vecs = GraphTripleConv(
                input_dim=cfg.embedding_dim, attributes_dim=attributes_dim,
                output_dim=cfg.gconv_dim, hidden_dim=cfg.gconv_hidden_dim,
                pooling=cfg.gconv_pooling,
                mlp_normalization=cfg.mlp_normalization, name="gconv")(
                    obj_vecs, pred_vecs, edges, triple_mask, train=train)
        if cfg.gconv_num_layers > 1:
            obj_vecs, pred_vecs = GraphTripleConvNet(
                input_dim=cfg.gconv_dim, num_layers=cfg.gconv_num_layers - 1,
                hidden_dim=cfg.gconv_hidden_dim, pooling=cfg.gconv_pooling,
                mlp_normalization=cfg.mlp_normalization, name="gconv_net")(
                    obj_vecs, pred_vecs, edges, triple_mask, train=train)
        return obj_vecs, pred_vecs
