"""Scene-graph convolution (flax), padded-batch formulation.

Reference: ``GraphTripleConv`` / ``GraphTripleConvNet``
(``scene_generation/graph.py:33-147``). One layer: gather (s, o) vectors per
triple, run the concatenated ``[s, p, o]`` through ``net1``, split into new
(s', p', o') pieces, average-pool s'/o' back onto objects, run ``net2``.

TPU-native differences:
  * operates on (N, MAX_O, D) / (N, MAX_T, D) padded tensors with local
    per-image edge indices + a triple validity mask;
  * scatter_add pooling (graph.py:94-116) becomes one-hot MXU matmuls
    (ops/graph_ops.segment_pool_objects).
"""
from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn

from scene_generation_tpu.models.layers import MLP, kaiming_normal
from scene_generation_tpu.ops.graph_ops import segment_pool_objects, triple_gather


class GraphTripleConv(nn.Module):
    """One scene-graph conv layer (graph.py:33-122)."""
    input_dim: int
    attributes_dim: int = 0
    output_dim: Optional[int] = None
    hidden_dim: int = 512
    pooling: str = "avg"
    mlp_normalization: str = "none"
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, obj_vecs: jax.Array, pred_vecs: jax.Array,
                 edges: jax.Array, triple_mask: jax.Array, train: bool = True,
                 obj_mask: Optional[jax.Array] = None):
        """
        Args:
          obj_vecs: (N, O, input_dim + attributes_dim).
          pred_vecs: (N, T, input_dim).
          edges: (N, T, 2) int local [s, o] indices.
          triple_mask: (N, T) validity.
          obj_mask: (N, O) validity; only consumed when
            mlp_normalization='batch' (net2's masked BN statistics).
        Returns:
          (new_obj_vecs (N, O, Dout), new_pred_vecs (N, T, Dout)).
        """
        h = self.hidden_dim
        dout = self.output_dim if self.output_dim is not None else self.input_dim
        din = self.input_dim
        n, o = obj_vecs.shape[:2]
        t = pred_vecs.shape[1]

        s_vecs, o_vecs = triple_gather(obj_vecs, edges)
        t_vecs = jax.numpy.concatenate([s_vecs, pred_vecs, o_vecs], axis=-1)
        # net1: [3*Din + 2*A, H, 2H + Dout] (graph.py:49-52). Rows are
        # FLATTENED to (N*T, .) so mlp_normalization='batch' reproduces the
        # reference's BN1d over the packed triple axis — with the padded
        # slots excluded from the statistics via triple_mask (the reference
        # has no padded slots; masked BN is the padded-contract equivalent).
        new_t = MLP((3 * din + 2 * self.attributes_dim, h, 2 * h + dout),
                    batch_norm=self.mlp_normalization, dtype=self.dtype,
                    kernel_init=kaiming_normal, name="net1")(
                        t_vecs.reshape(n * t, -1), train=train,
                        weights=triple_mask.reshape(n * t)).reshape(n, t, -1)
        new_s = new_t[..., :h]
        new_p = new_t[..., h:h + dout]
        new_o = new_t[..., h + dout:2 * h + dout]

        pooled = segment_pool_objects(new_s, new_o, edges, triple_mask, o,
                                      pooling=self.pooling)
        # net2: [H, H, Dout] (graph.py:54-56); same flattened masked-BN
        # treatment over the object axis.
        ow = (obj_mask.reshape(n * o)
              if obj_mask is not None else None)
        new_obj = MLP((h, h, dout), batch_norm=self.mlp_normalization,
                      dtype=self.dtype, kernel_init=kaiming_normal,
                      name="net2")(pooled.reshape(n * o, -1), train=train,
                                   weights=ow).reshape(n, o, -1)
        return new_obj, new_p


class GraphTripleConvNet(nn.Module):
    """Stack of gconv layers (graph.py:125-147)."""
    input_dim: int
    num_layers: int = 5
    hidden_dim: int = 512
    pooling: str = "avg"
    mlp_normalization: str = "none"
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges, triple_mask,
                 train: bool = True, obj_mask=None):
        # Identical-shape layers: scan over stacked params (single trace).
        outer = self

        class _Body(nn.Module):
            @nn.compact
            def __call__(self, carry, _):
                obj_vecs, pred_vecs = carry
                obj_vecs, pred_vecs = GraphTripleConv(
                    input_dim=outer.input_dim, hidden_dim=outer.hidden_dim,
                    pooling=outer.pooling,
                    mlp_normalization=outer.mlp_normalization,
                    dtype=outer.dtype, name="gconv")(
                        obj_vecs, pred_vecs, edges, triple_mask, train=train,
                        obj_mask=obj_mask)
                return (obj_vecs, pred_vecs), None

        # batch_stats rides the scan axis too: with mlp_normalization=
        # 'batch' each layer owns per-layer BN running stats (omitting the
        # collection made init crash with ScopeCollectionNotFound).
        scanned = nn.scan(_Body,
                          variable_axes={"params": 0, "batch_stats": 0},
                          split_rngs={"params": True},
                          length=self.num_layers)
        (obj_vecs, pred_vecs), _ = scanned(name="layers")(
            (obj_vecs, pred_vecs), None)
        return obj_vecs, pred_vecs
