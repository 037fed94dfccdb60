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
from scene_generation_tpu.ops.images import wire_to_float
from scene_generation_tpu.ops.layout import (masks_to_layout,
                                             masks_to_layout_weights)


class ModelOutput(NamedTuple):
    imgs_pred: jax.Array                  # (N, H, W, 3)
    boxes_pred: jax.Array                 # (N, O, 4)
    masks_pred: jax.Array                 # (N, O, M, M)
    layout: Optional[jax.Array]           # GT layout (train) (N, H, W, C)
    layout_pred: jax.Array                # predicted-mask layout
    layout_wrong: Optional[jax.Array]     # wrong-texture layout (train)
    obj_repr: jax.Array                   # (N, O, rep_size) appearance vecs
    cls_vecs: jax.Array                   # (N, O, Ccls) layout class part:
    #                                       one-hot or learned embedding
    #                                       (config.py layout_embed_dim)


class SceneModel(nn.Module):
    """Reference ``Model`` (model.py:12-124) on the padded contract."""
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.jax_compute_dtype
        self.obj_embeddings = nn.Embed(cfg.num_objs, cfg.embedding_dim,
                                       dtype=dtype)
        self.pred_embeddings = nn.Embed(cfg.num_preds, cfg.embedding_dim,
                                        dtype=dtype)
        if cfg.layout_embed_dim:
            # Learned replacement for the one-hot layout class channels
            # (config.py layout_embed_dim) — unit-scale init so layout
            # magnitudes match the one-hot form it replaces.
            self.class_embed = nn.Embed(
                cfg.num_objs, cfg.layout_embed_dim, dtype=dtype,
                embedding_init=nn.initializers.normal(1.0))
        attributes_dim = cfg.num_attributes if cfg.use_attributes else 0
        self._attributes_dim = attributes_dim
        if cfg.gconv_num_layers == 0:
            self.gconv_linear = nn.Dense(cfg.gconv_dim, dtype=dtype)
        else:
            self.gconv = GraphTripleConv(
                input_dim=cfg.embedding_dim, attributes_dim=attributes_dim,
                output_dim=cfg.gconv_dim, hidden_dim=cfg.gconv_hidden_dim,
                pooling=cfg.gconv_pooling, dtype=dtype,
                mlp_normalization=cfg.mlp_normalization)
        if cfg.gconv_num_layers > 1:
            self.gconv_net = GraphTripleConvNet(
                input_dim=cfg.gconv_dim, num_layers=cfg.gconv_num_layers - 1,
                hidden_dim=cfg.gconv_hidden_dim, pooling=cfg.gconv_pooling,
                dtype=dtype, mlp_normalization=cfg.mlp_normalization)
        # Reference parity keeps build_mlp's default final ReLU on the box
        # coordinates (model.py:63-66 + layers.py:215-231,
        # final_nonlinearity=True). That head is one dead-ReLU event away
        # from permanent collapse (observed in practice: runs/r2 synthetic
        # training, boxes pinned to 0 and IoU -> 0.0 at ~step 3500);
        # box_net_final="none" drops the terminal ReLU — documented
        # divergence, recommended for real training.
        self.box_net = MLP((cfg.box_dim, cfg.gconv_hidden_dim, 4),
                           batch_norm=cfg.mlp_normalization, dtype=dtype,
                           final_nonlinearity=cfg.box_net_final == "relu")
        self.mask_net = MaskNet(dim=cfg.g_mask_dim, mask_size=cfg.mask_size,
                                dtype=dtype)
        self.repr_net = MLP((cfg.g_mask_dim, cfg.rep_hidden_size,
                             cfg.rep_size),
                            batch_norm=cfg.mlp_normalization, dtype=dtype)
        self.image_encoder = AppearanceEncoder(
            arch=cfg.appearance_arch, vecs_size=cfg.g_mask_dim,
            normalization=cfg.appearance_normalization,
            activation=cfg.activation, dtype=dtype)
        self.layout_to_image = GlobalGenerator(
            output_nc=cfg.output_nc, ngf=cfg.ngf,
            n_downsampling=cfg.n_downsample_global,
            n_blocks=cfg.n_blocks_global, scan_blocks=cfg.scan_blocks,
            remat=cfg.remat_generator, torch_deconv=cfg.torch_deconv,
            dtype=dtype)

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
          wrong_rep: (N, O, rep_size) appearance vectors from the replay pool
            for the "wrong texture" negative (model.py:170).
        """
        cfg = self.cfg
        dtype = cfg.jax_compute_dtype
        n, o = objs.shape
        h, w = cfg.image_size
        if imgs is not None:
            # uint8 wire-format batches normalize on device (ops/images.py);
            # float inputs pass through at trace time.
            imgs = wire_to_float(imgs)

        with jax.named_scope("gcn"):
            obj_vecs = self.scene_graph_to_vectors(objs, triples, attributes,
                                                   triple_mask, train,
                                                   obj_mask=obj_mask)

        # --- create_components_vecs (model.py:145-172) ---
        box_vecs = obj_vecs
        noise = jnp.broadcast_to(mask_noise.astype(obj_vecs.dtype),
                                 (n, o, cfg.mask_noise_dim))
        mask_vecs = jnp.concatenate([obj_vecs, noise], axis=-1)  # (N,O,192)

        flat_w = obj_mask.reshape(n * o)
        if features is None:
            # Training: encode GT crops (model.py:156-157).
            crops = crop_bbox_batch(imgs.astype(dtype), boxes_gt,
                                    cfg.object_size)
            flat = crops.reshape(n * o, cfg.object_size, cfg.object_size, 3)
            obj_repr = self.encode_crops(flat, train, flat_w).reshape(
                n, o, cfg.rep_size)
        else:
            # Inference: repr from mask_vecs, overridden by given features
            # (model.py:159-163).
            obj_repr = self.repr_net(mask_vecs.reshape(n * o, -1),
                                     train=False).reshape(n, o, cfg.rep_size)
            if features_mask is None:
                features_mask = jnp.ones((n, o), obj_repr.dtype)
            fm = features_mask[..., None].astype(obj_repr.dtype)
            obj_repr = fm * features.astype(obj_repr.dtype) + (1 - fm) * obj_repr

        if cfg.layout_embed_dim:
            cls_vecs = self.class_embed(objs).astype(obj_repr.dtype)
        else:
            cls_vecs = jax.nn.one_hot(objs, cfg.num_objs,
                                      dtype=obj_repr.dtype)
        layout_vecs = jnp.concatenate([cls_vecs, obj_repr], axis=-1)

        # --- boxes (model.py:103) + masks (model.py:106-107) ---
        # Flattened rows + obj_mask weights so mlp_normalization='batch'
        # excludes padded object slots from box_net's BN statistics.
        boxes_pred = self.box_net(
            box_vecs.reshape(n * o, -1), train=train,
            weights=flat_w).reshape(n, o, 4).astype(jnp.float32)
        mask_logits = self.mask_net(
            mask_vecs.reshape(n * o, cfg.g_mask_dim), train=train,
            weights=flat_w)
        masks_pred = jax.nn.sigmoid(mask_logits.astype(jnp.float32)).reshape(
            n, o, cfg.mask_size, cfg.mask_size)

        if test_mode:
            boxes = boxes_gt if use_gt_box else boxes_pred
            masks = masks_gt if masks_gt is not None else masks_pred
            if cfg.factored_stem:
                # Rank-O path: composite only the (N,O,H,W) weight field
                # and feed the factorization straight into the generator
                # stem (StemConv docstring). layout_pred is materialized
                # from the SAME weights for ModelOutput consumers — XLA
                # DCE drops it when the caller only reads imgs_pred
                # (e.g. serving), so the 204-channel tensor never exists
                # on the hot path.
                with jax.named_scope("compositor"):
                    lw = masks_to_layout_weights(
                        layout_vecs, boxes.astype(dtype),
                        masks.astype(dtype), obj_mask, h, w, test_mode=True)
                    layout_pred = jnp.einsum(
                        "nohw,nod->nhwd", lw, layout_vecs,
                        preferred_element_type=dtype)
                # Stem backend, resolved like the compositor's: the fused
                # Pallas VMEM kernel on TPU (2.5x the XLA 'patches' form at
                # b16, scripts/stem_microbench.py), 'patches' elsewhere.
                stem_impl = cfg.test_stem_backend
                if stem_impl == "auto":
                    stem_impl = ("pallas"
                                 if jax.default_backend() == "tpu" else None)
                elif stem_impl == "xla":
                    stem_impl = None
                with jax.named_scope("generator"):
                    imgs_pred = self.layout_to_image(
                        layout_weights=jnp.transpose(lw, (0, 2, 3, 1)),
                        layout_vecs=layout_vecs,
                        stem_impl=stem_impl).astype(jnp.float32)
            else:
                with jax.named_scope("compositor"):
                    layout_pred = masks_to_layout(
                        layout_vecs, boxes.astype(dtype),
                        masks.astype(dtype), obj_mask, h, w, test_mode=True,
                        backend=cfg.test_compositor_backend)
                with jax.named_scope("generator"):
                    imgs_pred = self.layout_to_image(layout_pred).astype(
                        jnp.float32)
            return ModelOutput(imgs_pred, boxes_pred, masks_pred, None,
                               layout_pred.astype(jnp.float32), None,
                               obj_repr.astype(jnp.float32),
                               cls_vecs.astype(jnp.float32))

        # Train: image is generated from the GT layout; predicted boxes and
        # masks train only through their own losses (model.py:119-123).
        # XLA compositing — measured faster backward than the (removed)
        # Pallas train pair (RESULTS.md §10).
        backend = "xla"
        with jax.named_scope("compositor"):
            if cfg.factored_stem:
                # The GT layout still materializes (D_img conditions on it,
                # trainer/step.py), but the generator stem contracts the
                # rank-O factor — saving the dense 204-channel stem conv in
                # forward AND backward.
                lw_gt = masks_to_layout_weights(layout_vecs, boxes_gt,
                                                masks_gt, obj_mask, h, w,
                                                test_mode=False)
                layout = jnp.einsum("nohw,nod->nhwd", lw_gt, layout_vecs,
                                    preferred_element_type=dtype)
            else:
                layout = masks_to_layout(layout_vecs, boxes_gt, masks_gt,
                                         obj_mask, h, w, test_mode=False,
                                         backend=backend)
            layout_pred = masks_to_layout(layout_vecs, boxes_gt, masks_pred,
                                          obj_mask, h, w, test_mode=False,
                                          backend=backend)
            if wrong_rep is None:
                wrong_rep = obj_repr
            wrong_vecs = jnp.concatenate(
                [cls_vecs, wrong_rep.astype(obj_repr.dtype)], axis=-1)
            layout_wrong = masks_to_layout(wrong_vecs, boxes_gt, masks_gt,
                                           obj_mask, h, w, test_mode=False,
                                           backend=backend)
        with jax.named_scope("generator"):
            if cfg.factored_stem:
                imgs_pred = self.layout_to_image(
                    layout_weights=jnp.transpose(lw_gt, (0, 2, 3, 1)),
                    layout_vecs=layout_vecs).astype(jnp.float32)
            else:
                imgs_pred = self.layout_to_image(layout).astype(jnp.float32)
        return ModelOutput(imgs_pred, boxes_pred, masks_pred,
                           layout.astype(jnp.float32),
                           layout_pred.astype(jnp.float32),
                           layout_wrong.astype(jnp.float32),
                           obj_repr.astype(jnp.float32),
                           cls_vecs.astype(jnp.float32))

    def encode_crops(self, crops_flat: jax.Array, train: bool = False,
                     weights: Optional[jax.Array] = None) -> jax.Array:
        """Appearance path: crops -> encoder -> repr (model.py:156-157);
        exposed for scripts/encode_features.py."""
        enc = self.image_encoder(crops_flat, train=train, weights=weights)
        return self.repr_net(enc, train=train, weights=weights)

    def scene_graph_to_vectors(self, objs, triples, attributes, triple_mask,
                               train: bool = True, obj_mask=None):
        """Reference ``scene_graph_to_vectors`` (model.py:126-143).

        ``obj_mask`` feeds the gconv net2 masked-BN statistics when
        mlp_normalization='batch' (padded slots excluded, matching the
        reference's BN1d over its packed, pad-free object axis)."""
        cfg = self.cfg
        p = triples[..., 1]
        edges = jnp.stack([triples[..., 0], triples[..., 2]], axis=-1)

        obj_vecs = self.obj_embeddings(objs)
        pred_vecs = self.pred_embeddings(p)
        if cfg.use_attributes:
            obj_vecs = jnp.concatenate(
                [obj_vecs, attributes.astype(obj_vecs.dtype)], axis=-1)

        if cfg.gconv_num_layers == 0:
            obj_vecs = self.gconv_linear(obj_vecs)
        else:
            obj_vecs, pred_vecs = self.gconv(obj_vecs, pred_vecs, edges,
                                             triple_mask, train=train,
                                             obj_mask=obj_mask)
        if cfg.gconv_num_layers > 1:
            obj_vecs, pred_vecs = self.gconv_net(obj_vecs, pred_vecs, edges,
                                                 triple_mask, train=train,
                                                 obj_mask=obj_mask)
        return obj_vecs
