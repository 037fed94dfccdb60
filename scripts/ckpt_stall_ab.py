"""Measure the caller-side checkpoint save stall: sync vs async manager.

VERDICT r4 #3: the old save path blocked the step loop for a synchronous
~0.5 GB jax.device_get (minutes over the axon tunnel) + the Orbax write.
The async manager (trainer/checkpoint.py) returns after one on-device
snapshot copy and runs fetch + write + meta on a serial background worker.

This script builds the DEFAULT-config train state (the production ~0.5 GB
pytree) on the real device and times, for each mode:
  - stall_s:   how long save(state); save_meta(meta) blocks the caller
               (the training step loop's view),
  - durable_s: time until wait() returns (the checkpoint is on disk).
Async should cut stall_s to ~the on-device copy dispatch while durable_s
stays in the same band as the sync total.

Run on the TPU host:  python scripts/ckpt_stall_ab.py [--out /tmp/x.json]
"""
import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax
    import bench  # noqa: E402  (config + state builders, logging)
    from scene_generation_tpu.config import Config
    from scene_generation_tpu.data.synthetic import synthetic_batch
    from scene_generation_tpu.trainer.train_state import create_train_state
    from scene_generation_tpu.trainer.checkpoint import CheckpointManager

    cfg = Config()
    batch = synthetic_batch(cfg, seed=0)
    t0 = time.perf_counter()
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                  load_vgg=False)
    jax.block_until_ready(state.g_params)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(state)
                 if hasattr(x, "nbytes"))
    bench.log(f"state built in {time.perf_counter() - t0:.1f}s, "
              f"{nbytes / 1e9:.2f} GB")

    results = {"state_gb": round(nbytes / 1e9, 3)}
    for mode, use_async in (("sync", False), ("async", True)):
        stalls, durables = [], []
        for r in range(args.repeats):
            d = tempfile.mkdtemp(prefix=f"ckpt_{mode}_")
            ckpt = CheckpointManager(d, "ckpt", use_async=use_async)
            meta = {"counters": {"t": r}}
            t0 = time.perf_counter()
            ckpt.save(state)
            ckpt.save_meta(meta)
            stall = time.perf_counter() - t0
            ckpt.wait()
            durable = time.perf_counter() - t0
            stalls.append(stall)
            durables.append(durable)
            bench.log(f"[{mode} #{r}] stall {stall:.2f}s, "
                      f"durable {durable:.2f}s")
            shutil.rmtree(d, ignore_errors=True)
        results[mode] = {"stall_s": [round(s, 3) for s in stalls],
                         "durable_s": [round(s, 3) for s in durables]}

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
