"""Benchmark: flagship inference throughput on the local accelerator.

Measures the full test-mode pipeline (scene graph -> GCN -> boxes/masks ->
occlusion-ordered layout composition -> pix2pixHD generator -> 128x128
image) at the reference's default architecture (172 classes, 5 gconv layers,
9 resblocks @1024ch) — the exact path ``scripts/sample_images.py`` exercises
in the reference. Runs in bf16 compute (params f32).

Methodology: the local runtime dispatches asynchronously and host readbacks
pay a large tunnel latency, so K forward passes are enqueued back-to-back
with a data dependency between consecutive calls (each call's noise is
derived from the previous image), forcing sequential device execution, and
only the last result is read back; per-iteration device time =
(T(K) - T(1)) / (K - 1), which cancels both dispatch and readback latency.

Baseline: the reference repo ships no numbers and no timing code
(BASELINE.md). ``VS_BASELINE_REF`` is an analytic estimate of the
reference's single-V100 inference throughput: the generator dominates at
~50 GFLOP/image; V100 fp32 at a generous 30% utilization (~4.5 TFLOP/s)
gives ~90 img/s. Treat >= 1.0 as parity.
"""
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: repeat bench runs skip the (remote) compile.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VS_BASELINE_REF = 90.0  # img/s, estimated reference V100 inference (docstring)
BATCH = 16
K_LONG = 17
REPEATS = 5


def build_forward():
    from scene_generation_tpu.config import Config
    from scene_generation_tpu.data import synthetic_batch
    from scene_generation_tpu.models import SceneModel

    cfg = Config()
    # scan_blocks=True compiles ~6x faster at ~8% throughput cost; the
    # remote compiler is flaky enough on cold caches that reliability wins
    # for the recorded benchmark (unrolled serving measured 1097 img/s
    # pre-Pallas vs 998 scanned; with the Pallas compositor 1407 unrolled).
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="bfloat16", scan_blocks=True))
    mc = cfg.model
    batch = synthetic_batch(cfg, seed=0, batch_size=BATCH)
    model = SceneModel(mc)
    objs = jnp.asarray(batch.objs)
    triples = jnp.asarray(batch.triples)
    attrs = jnp.asarray(batch.attributes)
    obj_mask = jnp.asarray(batch.obj_mask)
    triple_mask = jnp.asarray(batch.triple_mask)
    n, o = objs.shape
    features = jnp.zeros((n, o, mc.rep_size), jnp.float32)
    features_mask = jnp.zeros((n, o), jnp.float32)
    noise0 = jnp.zeros((mc.mask_noise_dim,), jnp.float32)

    # Jit the init: eager init dispatches thousands of tiny remote ops
    # through the tunnel (minutes); compiled it is one round trip. All
    # inputs are arguments so XLA cannot constant-fold the traced forward.
    def init_fn(k, objs, triples, attrs, obj_mask, triple_mask, noise0,
                features, features_mask):
        return model.init(k, objs, triples, attrs, obj_mask, triple_mask,
                          noise0, test_mode=True, train=False,
                          features=features, features_mask=features_mask)

    variables = jax.jit(init_fn)(
        jax.random.PRNGKey(0), objs, triples, attrs, obj_mask, triple_mask,
        noise0, features, features_mask)

    # NOTE: variables/inputs are passed as ARGUMENTS — captured in a closure
    # they would be baked into the HLO as giant literal constants and stall
    # compilation.
    @jax.jit
    def single(variables, inputs, noise):
        objs, triples, attrs, obj_mask, triple_mask, features, fmask = inputs
        out = model.apply(variables, objs, triples, attrs, obj_mask,
                          triple_mask, noise, test_mode=True, train=False,
                          features=features, features_mask=fmask)
        img = out.imgs_pred
        # Next-call noise derived from this image: the data dependency makes
        # the device execute chained calls strictly sequentially.
        next_noise = noise + jnp.mean(img) * 1e-6
        return img, next_noise

    inputs = (objs, triples, attrs, obj_mask, triple_mask, features,
              features_mask)
    return single, variables, inputs


def timed_chain(single, variables, inputs, k, repeats=REPEATS):
    ts = []
    for _ in range(repeats):
        noise = jnp.zeros((64,), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(k):
            img, noise = single(variables, inputs, noise)
        float(jnp.mean(img))  # one readback syncs the whole chain
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import sys

    def log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    single, variables, inputs = build_forward()
    log(f"init dispatched {time.perf_counter() - t0:.1f}s")
    img, noise = single(variables, inputs, jnp.zeros((64,), jnp.float32))
    float(jnp.mean(img))
    log(f"compile+warm done {time.perf_counter() - t0:.1f}s")
    t1 = timed_chain(single, variables, inputs, 1)
    log(f"t1={t1:.3f}s")
    tk = timed_chain(single, variables, inputs, K_LONG)
    log(f"tK={tk:.3f}s")
    per_iter = (tk - t1) / (K_LONG - 1)
    imgs_per_sec = BATCH / per_iter

    print(json.dumps({
        "metric": "inference_images_per_sec_128px",
        "value": round(imgs_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / VS_BASELINE_REF, 3),
    }))


if __name__ == "__main__":
    main()
