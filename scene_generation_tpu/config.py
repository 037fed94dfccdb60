"""Typed configuration tree for scene_generation_tpu.

Mirrors the reference flag system (``scene_generation/args.py:10-113``) as a
single dataclass tree instead of a flat argparse namespace. Checkpoints embed
the config (reference embeds ``args.__dict__``, ``train.py:133``) so inference
scripts can rebuild the exact architecture.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Dataset options (reference args.py:18-47)."""
    image_size: Tuple[int, int] = (128, 128)
    mask_size: int = 32
    batch_size: int = 12
    num_train_samples: Optional[int] = None
    num_val_samples: int = 1024
    shuffle_val: bool = True
    coco_dir: str = "datasets/coco"
    train_image_dir: str = "datasets/coco/images/train2017"
    val_image_dir: str = "datasets/coco/images/val2017"
    train_instances_json: str = "datasets/coco/annotations/instances_train2017.json"
    train_stuff_json: str = "datasets/coco/annotations/stuff_train2017.json"
    val_instances_json: str = "datasets/coco/annotations/instances_val2017.json"
    val_stuff_json: str = "datasets/coco/annotations/stuff_val2017.json"
    panoptic_train_json: str = "datasets/coco/annotations/panoptic_train2017.json"
    panoptic_val_json: str = "datasets/coco/annotations/panoptic_val2017.json"
    panoptic_segmentation_train: str = "datasets/coco/panoptic/annotations/panoptic_train2017"
    panoptic_segmentation_val: str = "datasets/coco/panoptic/annotations/panoptic_val2017"
    instance_whitelist: Optional[Tuple[str, ...]] = None
    stuff_whitelist: Optional[Tuple[str, ...]] = None
    include_other: bool = False
    min_object_size: float = 0.02
    min_objects_per_image: int = 3
    max_objects_per_image: int = 8
    stuff_only: bool = True
    is_panoptic: bool = False
    # Padded static-shape contract (replaces the reference's ragged
    # obj_to_img/triple_to_img maps, coco.py:501-547). One slot is reserved
    # for the dummy __image__ object; triples = one geometric relation per
    # real object + one __in_image__ edge per real object.
    max_objs: int = 9            # max_objects_per_image + 1 (__image__)
    max_triples: int = 16        # 8 relations + 8 __in_image__ edges
    # Attribute encoding (coco.py:96-98): 10 size bins + 5x5 location grid.
    size_attribute_len: int = 10
    grid_size: int = 25

    @property
    def num_attributes(self) -> int:
        return self.size_attribute_len + self.grid_size


@dataclass(frozen=True)
class ModelConfig:
    """Generator stack hyperparameters (reference args.py:49-68, model.py:12-92)."""
    image_size: Tuple[int, int] = (128, 128)
    mask_size: int = 32
    embedding_dim: int = 128
    gconv_dim: int = 128
    gconv_hidden_dim: int = 512
    gconv_pooling: str = "avg"
    gconv_num_layers: int = 5
    mlp_normalization: str = "none"
    appearance_normalization: str = "batch"
    activation: str = "leakyrelu-0.2"
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    ngf: int = 64
    norm_g: str = "instance"
    box_dim: int = 128
    use_attributes: bool = True
    appearance_arch: str = "C4-64-2,C4-128-2,C4-256-2"  # model.py:79
    box_noise_dim: int = 64
    mask_noise_dim: int = 64
    pool_size: int = 100
    rep_size: int = 32
    rep_hidden_size: int = 64
    object_size: int = 64        # appearance-encoder crop size (model.py:27)
    output_nc: int = 3
    # Vocab sizes (filled from dataset vocab at build time).
    num_objs: int = 172
    num_preds: int = 7
    num_attributes: int = 35
    # TPU-specific: computation dtype for convs/matmuls (params stay f32).
    compute_dtype: str = "float32"
    # Scan identical resblocks (fast compiles) vs unroll (max throughput).
    scan_blocks: bool = True
    # Bit-match the reference's ConvTranspose2d(k3, s2, p1, op1) in the
    # generator upsampling (required to port reference generator weights;
    # see GlobalGenerator.torch_deconv). Default keeps the flax 'SAME'
    # variant existing checkpoints were trained with.
    torch_deconv: bool = False
    # Train-path compositing is XLA-only: the custom-VJP Pallas train pair
    # was removed after honest forced-readback A/Bs (2026-08-17, 1x v5e)
    # showed step-level parity (74.8 vs 74.6 ms) and an 8x-slower op-level
    # backward (4.8 vs 0.6 ms) — RESULTS.md §10 has the full numbers and
    # the structural analysis.
    # Inference/test-mode compositor backend (model.py test path): 'auto'
    # resolves to the fused Pallas occlusion compositor on TPU — measured
    # +24% end-to-end serving (1237 vs 996 img/s @ batch 16 bf16,
    # forced-readback A/B 2026-08-17).
    test_compositor_backend: str = "auto"
    # 0 = reference parity: layout class channels are a num_objs one-hot
    # (204 total at COCO scale). >0 = composite a LEARNED class embedding
    # of this dim instead. Motivation (measured, RESULTS.md §13): the
    # generator's 7x7 stem on the 204-channel layout runs at 16% of peak
    # and is 21.8 of 47.9 ms/batch-64 serving; stem wall time scales with
    # input channels (128ch -> 10.9 ms), so embed_dim 64 cuts the stem
    # ~2.2x and shrinks every layout-sized tensor (compositor, D_img
    # conditioning) ~2x. Changes the trained architecture — checkpoints
    # are not interchangeable with the one-hot form.
    layout_embed_dim: int = 0
    # Route the generator stem through the layout's rank-O factorization
    # (ops/layout.py masks_to_layout_weights + generators.py StemConv):
    # the 7x7 stem contracts the (N,H,W,O=9) per-object weight field
    # instead of the (N,H,W,204) materialized layout — ~22x fewer stem
    # FLOPs/HBM with IDENTICAL math (the layout is rank-O by construction;
    # only float reassociation differs). Unlike layout_embed_dim this is
    # not an architecture change: checkpoints interchange freely and
    # quality is untouched. Default on; False restores the dense stem
    # (and, in test mode, the Pallas dense compositor via
    # test_compositor_backend).
    factored_stem: bool = True
    # Test-mode backend for the factored stem contraction (StemConv):
    # 'auto' resolves to the fused Pallas VMEM kernel (ops/pallas/stem.py)
    # on TPU — the im2col patch matrix never touches HBM; measured
    # 0.84/4.2/10.2 ms at b16/b64/b128 vs 2.1/6.9/18.3 for the XLA
    # 'patches' form (scripts/stem_microbench.py, 1x v5e bf16). 'xla'
    # forces 'patches'. The TRAIN path always uses 'patches' (the Pallas
    # kernel is not differentiable), so this knob is test/serving only —
    # same contract as test_compositor_backend.
    test_stem_backend: str = "auto"
    # Rematerialize generator resblocks in backward (memory for FLOPs).
    remat_generator: bool = False
    # Terminal nonlinearity of the box head: "relu" = reference parity
    # (build_mlp final_nonlinearity, layers.py:215-231) — prone to dead-ReLU
    # collapse (boxes pinned to 0, observed in synthetic training);
    # "none" = plain linear output (recommended; documented divergence).
    box_net_final: str = "relu"

    @property
    def jax_compute_dtype(self):
        import jax.numpy as jnp
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                "float16": jnp.float16,
                # f64 is for CPU parity goldens (tests/test_model_port_
                # golden.py), not TPU execution.
                "float64": jnp.float64}[self.compute_dtype]

    @property
    def g_mask_dim(self) -> int:
        # model.py:68 — gconv_dim + mask_noise_dim.
        return self.gconv_dim + self.mask_noise_dim

    @property
    def layout_nc(self) -> int:
        # model.py:87 — class channels ++ appearance repr. Reference: the
        # class part is a num_objs one-hot; layout_embed_dim replaces it
        # with a learned embedding (see the field's comment).
        return (self.layout_embed_dim or self.num_objs) + self.rep_size


@dataclass(frozen=True)
class DiscriminatorConfig:
    """Discriminator hyperparameters (reference args.py:81-100)."""
    # Image discriminator (MultiscaleDiscriminator, discriminators.py:172).
    ndf: int = 64
    num_d: int = 2
    norm_d: str = "instance"
    n_layers_d: int = 3
    no_lsgan: bool = False
    # Mask discriminator (MultiscaleMaskDiscriminator, discriminators.py:87).
    ndf_mask: int = 64
    num_d_mask: int = 1
    norm_d_mask: str = "instance"
    n_layers_d_mask: int = 2
    # Object crop discriminator (AcCropDiscriminator, discriminators.py:39).
    gan_loss_type: str = "gan"
    d_normalization: str = "batch"
    d_padding: str = "valid"
    d_activation: str = "leakyrelu-0.2"
    d_obj_arch: str = "C4-64-2,C4-128-2,C4-256-2"
    crop_size: int = 32
    # Compute dtype for the three discriminators + the VGG perceptual
    # features (params stay f32; losses accumulate in f32). bf16 is the
    # TPU-native choice; the generator's training dtype is governed
    # separately by ModelConfig.compute_dtype.
    compute_dtype: str = "bfloat16"

    @property
    def jax_compute_dtype(self):
        import jax.numpy as jnp
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                "float16": jnp.float16,
                # f64 is for CPU parity goldens (tests/test_model_port_
                # golden.py), not TPU execution.
                "float64": jnp.float64}[self.compute_dtype]


@dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference args.py:70-79)."""
    l1_pixel_loss_weight: float = 0.0
    bbox_pred_loss_weight: float = 10.0
    vgg_features_weight: float = 10.0
    d_img_weight: float = 1.0
    d_img_features_weight: float = 10.0
    d_mask_weight: float = 1.0
    d_mask_features_weight: float = 10.0
    d_obj_weight: float = 0.1
    ac_loss_weight: float = 0.1
    # Reference parity: box MSE (and L1) apply only on use_gt=1 steps
    # (trainer.py:210-216), so boxes predicted from zeroed attributes are
    # never supervised and the no-attribute path decays over training
    # (RESULTS.md §3/§5). box_loss_gated=False supervises boxes on every
    # step — a documented beyond-reference option for scene-graph-only
    # serving.
    box_loss_gated: bool = True


@dataclass(frozen=True)
class TrainConfig:
    """Optimization + orchestration (reference args.py:12-16,102-109)."""
    num_iterations: int = 1_000_000
    learning_rate: float = 1e-4
    mask_learning_rate: float = 1e-5
    beta1: float = 0.5
    beta2: float = 0.999
    print_every: int = 100
    checkpoint_every: int = 10_000
    output_dir: str = "output"
    checkpoint_name: str = "checkpoint"
    restore_from_checkpoint: bool = False
    seed: int = 0
    # TPU-specific.
    profile_dir: Optional[str] = None
    mesh_shape: Optional[Tuple[int, ...]] = None   # None = all local devices on 'data'
    # Adam moment STORAGE dtypes ("" = f32, reference parity). "bfloat16"
    # mu halves its HBM traffic in the bandwidth-bound step (RESULTS §30).
    # nu needs finer resolution than bf16 at b2=0.999 (trainer/optim.py:
    # bf16 nu freezes — executable proof in tests/test_optim.py); f16 nu
    # accumulates but underflows for sustained |g| < ~2e-4.
    adam_mu_dtype: str = ""
    adam_nu_dtype: str = ""
    # Gradient-tree storage dtype at the backward->optimizer boundary
    # ("" = f32, reference parity). "bfloat16" halves any HBM
    # materialization of the grad trees between backward and the Adam
    # update; measured A/B in RESULTS §37 (trainer/step.py casts, the
    # moment math promotes back to f32).
    grads_dtype: str = ""


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)

        def _tup(x):
            return tuple(x) if isinstance(x, list) else x

        def _build(cls, sub):
            fields = {f.name: f for f in dataclasses.fields(cls)}
            kw = {}
            for k, v in sub.items():
                if k in fields:
                    kw[k] = _tup(v)
            return cls(**kw)

        return Config(
            data=_build(DataConfig, d.get("data", {})),
            model=_build(ModelConfig, d.get("model", {})),
            discriminator=_build(DiscriminatorConfig, d.get("discriminator", {})),
            loss=_build(LossConfig, d.get("loss", {})),
            train=_build(TrainConfig, d.get("train", {})),
        )


def tiny_config() -> Config:
    """Smallest viable config — fast XLA:CPU compiles for train-step tests
    and the multi-chip dry run."""
    return Config(
        data=DataConfig(image_size=(32, 32), mask_size=8, batch_size=4,
                        max_objs=4, max_triples=6, min_objects_per_image=2,
                        max_objects_per_image=3),
        model=ModelConfig(image_size=(32, 32), mask_size=8, embedding_dim=16,
                          gconv_dim=16, gconv_hidden_dim=32, gconv_num_layers=1,
                          n_downsample_global=1, n_blocks_global=1, ngf=4,
                          box_dim=16, mask_noise_dim=8, rep_size=4,
                          rep_hidden_size=8, object_size=16, num_objs=7,
                          num_preds=7, pool_size=3,
                          appearance_arch="C4-8-2,C4-16-2"),
        discriminator=DiscriminatorConfig(ndf=4, ndf_mask=4, num_d=1,
                                          n_layers_d=1, n_layers_d_mask=1,
                                          d_obj_arch="C4-8-2", crop_size=8),
        loss=LossConfig(vgg_features_weight=0.0),
        train=TrainConfig(num_iterations=4, print_every=2, checkpoint_every=4),
    )


def test_config() -> Config:
    """A tiny config for fast hermetic CPU tests: 64x64 images, small nets."""
    return Config(
        data=DataConfig(image_size=(64, 64), mask_size=16, batch_size=2,
                        max_objs=5, max_triples=8),
        model=ModelConfig(image_size=(64, 64), mask_size=16, embedding_dim=32,
                          gconv_dim=32, gconv_hidden_dim=64, gconv_num_layers=2,
                          n_downsample_global=2, n_blocks_global=2, ngf=8,
                          box_dim=32, mask_noise_dim=16, rep_size=8,
                          rep_hidden_size=16, object_size=32, num_objs=12,
                          num_preds=7, pool_size=4,
                          appearance_arch="C4-8-2,C4-16-2,C4-32-2"),
        discriminator=DiscriminatorConfig(ndf=8, ndf_mask=8,
                                          d_obj_arch="C4-8-2,C4-16-2",
                                          crop_size=16),
        train=TrainConfig(num_iterations=10, print_every=5, checkpoint_every=10),
    )
