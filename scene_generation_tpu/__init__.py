"""scene_generation_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
interactive scene generation from scene graphs.

Re-implements, TPU-first, the capabilities of the reference system
"Specifying Object Attributes and Relations in Interactive Scene Generation"
(Ashual & Wolf, ICCV 2019): scene-graph convolution -> per-object boxes/masks
-> differentiable layout composition -> image generation, trained
adversarially against image / mask / object-crop discriminators.

Design notes (vs. the CUDA/torch reference):
  * The ragged per-object axis (reference ``obj_to_img`` index maps,
    coco.py:501-547) is replaced by a padded, static-shape batch contract
    ``(N, MAX_OBJS, ...)`` with validity masks, so every op vmaps over the
    batch axis and the whole train step jits.
  * ``F.grid_sample`` (cuDNN kernel; layout.py:51,86, bilinear.py:130) is
    replaced by separable 1-D interpolation *matrices* so mask resampling and
    ROI crops run as dense matmuls on the TPU MXU (see ops/sampling.py).
  * ``scatter_add`` GCN pooling (graph.py:94-116) becomes one-hot matmul
    segment pooling (ops/graph_ops.py).
  * Data parallelism is expressed with ``jax.sharding`` over a Mesh; XLA
    inserts the collectives (parallel/mesh.py).
"""

__version__ = "0.1.0"
