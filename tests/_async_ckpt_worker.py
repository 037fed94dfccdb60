"""Subprocess worker for the SIGKILL-during-async-save fault test.

Writes a durable t=2 checkpoint synchronously, then starts an async t=4
save whose Orbax write is artificially stalled, prints ASYNC_PENDING the
moment save()+save_meta() have RETURNED (proving they don't block), and
spins until the parent SIGKILLs it mid-write. The parent then asserts the
t=2 checkpoint is still the durable, restorable state of record.
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from scene_generation_tpu.trainer.checkpoint import CheckpointManager  # noqa: E402


def main(out_dir: str) -> None:
    ckpt = CheckpointManager(out_dir, "checkpoint", use_async=True)

    state2 = {"w": jnp.full((256,), 2.0, jnp.float32)}
    meta2 = {"counters": {"t": 2, "epoch": 0}}
    ckpt.save(state2)
    ckpt.save_meta(meta2)
    ckpt.wait()
    print("DURABLE_T2", flush=True)

    # Stall the state write INSIDE the background worker so the parent's
    # SIGKILL lands in the async-save window deterministically.
    real_save = ckpt._ckptr.save

    def slow_save(path, item, **kw):
        time.sleep(60.0)
        return real_save(path, item, **kw)

    ckpt._ckptr.save = slow_save

    state4 = {"w": jnp.full((256,), 4.0, jnp.float32)}
    ckpt.save(state4)
    ckpt.save_meta({"counters": {"t": 4, "epoch": 0}})
    print("ASYNC_PENDING", flush=True)  # both calls returned un-blocked
    time.sleep(120.0)  # parent kills us here


if __name__ == "__main__":
    main(sys.argv[1])
