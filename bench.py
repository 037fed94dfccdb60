"""Benchmark: flagship inference throughput on the local accelerator.

Measures the full test-mode pipeline (scene graph -> GCN -> boxes/masks ->
occlusion-ordered layout composition -> pix2pixHD generator -> 128x128
image) at the reference's default architecture (172 classes, 5 gconv layers,
9 resblocks @1024ch) — the exact path ``scripts/sample_images.py`` exercises
in the reference.

Baseline: the reference repo ships no numbers and no timing code
(BASELINE.md). ``VS_BASELINE_REF`` is therefore an analytic estimate of the
reference's single-V100 inference throughput: the generator dominates at
~50 GFLOP/image (7x7 stem 21G + 18 conv3x3 @1024ch/8x8 = 22G + up/downsample
~5G + D-free inference path); V100 fp32 at a generous 30% utilization
(~4.5 TFLOP/s) gives ~90 img/s. Single-GPU PyTorch with per-batch Python
overhead lands at or below this; treat >=1.0 as parity.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

VS_BASELINE_REF = 90.0  # img/s, estimated reference V100 inference (see above)
BATCH = 16
ITERS = 20


def main():
    from __graft_entry__ import entry  # noqa: F401  (shares the model path)
    from scene_generation_tpu.config import Config
    from scene_generation_tpu.data import synthetic_batch
    from scene_generation_tpu.models import SceneModel

    cfg = Config()
    mc = cfg.model
    batch = synthetic_batch(cfg, seed=0, batch_size=BATCH)
    model = SceneModel(mc)
    noise = jnp.zeros((mc.mask_noise_dim,), jnp.float32)
    objs = jnp.asarray(batch.objs)
    triples = jnp.asarray(batch.triples)
    attrs = jnp.asarray(batch.attributes)
    obj_mask = jnp.asarray(batch.obj_mask)
    triple_mask = jnp.asarray(batch.triple_mask)
    n, o = objs.shape
    features = jnp.zeros((n, o, mc.rep_size), jnp.float32)
    features_mask = jnp.zeros((n, o), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), objs, triples, attrs,
                           obj_mask, triple_mask, noise, test_mode=True,
                           train=False, features=features,
                           features_mask=features_mask)

    @jax.jit
    def forward(params, noise):
        out = model.apply(params, objs, triples, attrs, obj_mask,
                          triple_mask, noise, test_mode=True, train=False,
                          features=features, features_mask=features_mask)
        return out.imgs_pred

    params = variables
    # Warmup / compile.
    img = forward(params, noise)
    jax.block_until_ready(img)

    times = []
    for i in range(ITERS):
        z = jnp.full((mc.mask_noise_dim,), float(i) * 0.01, jnp.float32)
        t0 = time.perf_counter()
        jax.block_until_ready(forward(params, z))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    imgs_per_sec = BATCH / dt

    print(json.dumps({
        "metric": "inference_images_per_sec_128px",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / VS_BASELINE_REF, 3),
    }))


if __name__ == "__main__":
    main()
