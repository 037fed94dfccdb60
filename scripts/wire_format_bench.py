"""Sustained training-rate A/B: uint8 vs float32 host->device wire format.

Round-2 measured sustained tunnel training at ~216 ms/step wall against
74 ms/step device compute — the gap being per-batch host->device transfer
of f32 images (RESULTS.md §8.2). Round 3 switched the wire format to uint8
with on-device normalization (ops/images.py); this script measures the
steady-state wall rate both ways through the REAL pipeline (DataLoader ->
device_prefetch -> jitted adversarial step), emulating the old f32 wire by
normalizing on the host before device_put.

Wall-clock methodology: N steps are driven through the live dispatch
queue exactly as train.py does, then ONE final readback drains it; the
reported ms/step includes data loading, transfer, and compute overlap —
the number a user actually trains at. (block_until_ready is a no-op under
the tunnel; the final float() readback is the real sync.)

Usage: python scripts/wire_format_bench.py [--steps 50] [--warm 8]
Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--warm", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=12)
    a = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from scene_generation_tpu.config import Config
    from scene_generation_tpu.data.image_utils import normalize
    from scene_generation_tpu.data.loader import DataLoader, device_prefetch
    from scene_generation_tpu.data.synthetic import SyntheticDataset
    from scene_generation_tpu.trainer import create_train_state
    from scene_generation_tpu.trainer.step import make_train_step

    cfg = Config()
    dset = SyntheticDataset(cfg, size=512, seed=0)
    loader = DataLoader(dset, batch_size=a.batch_size,
                        max_objs=cfg.data.max_objs,
                        max_triples=cfg.data.max_triples, num_workers=4,
                        seed=0)
    init_batch = next(iter(loader))
    t0 = time.perf_counter()
    mods, state = create_train_state(cfg, jax.random.PRNGKey(0), init_batch,
                                     load_vgg=True)
    step = make_train_step(mods, donate=False)

    def run(wire):
        # Reads the enclosing `state` but never rebinds it: BOTH wire-format
        # legs deliberately start from the identical initial weights so the
        # A/B compares transfer cost, not training trajectory.
        def batches():
            while True:
                for b in loader:
                    if wire == "float32":
                        b = b._replace(imgs=normalize(b.imgs))
                    yield b
        it = device_prefetch(batches())
        s, m = state, None
        for _ in range(a.warm):
            s, m = step(s, next(it))
        float(m["total_loss"])  # drain warmup (incl. compile)
        t0 = time.perf_counter()
        for _ in range(a.steps):
            s, m = step(s, next(it))
        loss = float(m["total_loss"])  # drains the whole chain
        dt = (time.perf_counter() - t0) / a.steps
        assert np.isfinite(loss)
        print(f"# {wire}: {dt * 1e3:.1f} ms/step sustained "
              f"({a.batch_size / dt:.1f} img/s), loss {loss:.3f}",
              file=sys.stderr, flush=True)
        return dt

    # uint8 leg first (the new default), then the emulated f32 wire.
    dt_u8 = run("uint8")
    dt_f32 = run("float32")
    print(f"# init+compile+warm took {time.perf_counter() - t0:.0f}s total",
          file=sys.stderr)
    print(json.dumps({
        "sustained_ms_per_step_uint8_wire": round(dt_u8 * 1e3, 1),
        "sustained_ms_per_step_f32_wire": round(dt_f32 * 1e3, 1),
        "speedup": round(dt_f32 / dt_u8, 3),
        "batch_size": a.batch_size, "steps": a.steps,
    }))


if __name__ == "__main__":
    main()
