"""bf16 generator-training study (VERDICT r1 item 7).

Trains the full adversarial step for K steps twice from identical init —
compute_dtype=float32 vs bfloat16 (params stay f32 in both; optax states
f32) — on identical data, and reports loss trajectories, divergence, and
step time. Output JSON feeds RESULTS.md and the compute_dtype default
decision.

What bf16 covers: every conv/matmul in the generator, discriminators and
VGG run in bf16 with f32 params (flax dtype= semantics). What stays f32
regardless: losses/logits reductions (step.py upcasts via .astype(f32) at
module boundaries), box coordinates, BN/IN statistics, optimizer math.

Usage: python scripts/bf16_study.py [--steps 300] [--out runs/bf16.json]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(compute_dtype: str, steps: int, batches, log_every: int = 25):
    import jax
    from scene_generation_tpu.config import Config
    from scene_generation_tpu.trainer import create_train_state
    from scene_generation_tpu.trainer.step import make_train_step

    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype=compute_dtype))
    mods, state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0],
                                     load_vgg=True)
    step = make_train_step(mods, donate=True)
    t_compile = time.perf_counter()
    state, metrics = step(state, batches[0])
    jax.block_until_ready(metrics["total_loss"])
    print(f"[{compute_dtype}] first step "
          f"{time.perf_counter() - t_compile:.1f}s (incl. compile)",
          flush=True)

    curve = {}
    t0 = time.perf_counter()
    for t in range(1, steps):
        state, metrics = step(state, batches[t % len(batches)])
        if t % log_every == 0 or t == steps - 1:
            scal = {k: float(v) for k, v in metrics.items()
                    if not k.startswith("_")}
            if not all(np.isfinite(v) for v in scal.values()):
                bad = [k for k, v in scal.items() if not np.isfinite(v)]
                print(f"[{compute_dtype}] NON-FINITE at t={t}: {bad}",
                      flush=True)
                return {"curve": curve, "diverged_at": t,
                        "ms_per_step": None}
            curve[t] = scal
            print(f"[{compute_dtype}] t={t} total={scal['total_loss']:.4f} "
                  f"vgg={scal.get('g_vgg', 0):.4f} "
                  f"img={scal.get('g_gan_img_loss', 0):.4f}", flush=True)
    jax.block_until_ready(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / (steps - 1)
    print(f"[{compute_dtype}] {dt * 1e3:.1f} ms/step avg", flush=True)
    return {"curve": curve, "diverged_at": None,
            "ms_per_step": round(dt * 1e3, 2)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--out", default="runs/bf16_study.json")
    a = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from scene_generation_tpu.config import Config
    from scene_generation_tpu.data import synthetic_batch

    cfg = Config()
    print("generating data...", flush=True)
    batches = [synthetic_batch(cfg, seed=s) for s in range(32)]

    results = {}
    for dtype in ("float32", "bfloat16"):
        results[dtype] = run(dtype, a.steps, batches)

    # Summary: terminal-loss gap and speedup.
    f32, bf16 = results["float32"], results["bfloat16"]
    summary = {}
    if f32["curve"] and bf16["curve"]:
        last = max(int(k) for k in f32["curve"])
        lf = f32["curve"][last]["total_loss"]
        lb = bf16["curve"][last]["total_loss"]
        summary["final_total_loss_f32"] = lf
        summary["final_total_loss_bf16"] = lb
        summary["rel_gap"] = abs(lb - lf) / (abs(lf) + 1e-9)
    if f32["ms_per_step"] and bf16["ms_per_step"]:
        summary["speedup_bf16"] = round(
            f32["ms_per_step"] / bf16["ms_per_step"], 3)
    results["summary"] = summary
    print(json.dumps(summary))
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
