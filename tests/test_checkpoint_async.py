"""Non-blocking single-host checkpoint saves (VERDICT r4 #3).

train.py calls ``save(state)`` then ``save_meta(meta)`` back-to-back every
checkpoint window; with the old synchronous ``jax.device_get`` the step
loop stalled for the full ~0.5 GB device->host fetch (minutes over the
axon tunnel, CLAUDE.md). The manager now snapshots the state ON DEVICE and
runs fetch + Orbax write + meta write on one serial background thread.
These tests pin the contract:

- save() is safe under buffer donation (the device snapshot is dispatched
  before the caller reuses/deletes the buffers),
- save_meta() serializes the dict AT CALL TIME and queues BEHIND the state
  commit (SIGKILL mid-async-save leaves the previous durable pair),
- background failures surface at wait()/the next save, never silently,
- restore casts dtypes to the configured template (ADVICE r4 #1:
  --adam_mu_dtype flipped between save and resume).

Recovery baseline being matched: reference train.py:119-130 restarts from
one atomic .pt; here the same durability must hold while saves overlap
training.
"""
import os
import signal
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scene_generation_tpu.trainer.checkpoint import CheckpointManager

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_async_ckpt_worker.py")


def test_async_save_survives_donation_and_meta_mutation(tmp_path):
    """restore() must return the state AS OF save() even when the caller
    (like train.py's donating step) destroys the source buffers right
    after save() returns, and meta.json must hold the dict AS OF
    save_meta() even though train.py keeps mutating it."""
    ckpt = CheckpointManager(str(tmp_path), "ckpt", use_async=True)
    state = {"w": jnp.arange(8, dtype=jnp.float32)}
    meta = {"counters": {"t": 7, "epoch": 1}}

    ckpt.save(state)
    state["w"].delete()  # donation: buffer gone the moment step() reuses it
    ckpt.save_meta(meta)
    meta["counters"]["t"] = 999  # caller mutates between checkpoints

    ckpt.wait()
    restored = ckpt.restore({"w": jnp.zeros(8, jnp.float32)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(8))
    assert ckpt.load_meta()["counters"]["t"] == 7


def test_async_promote_then_save_then_meta_all_land(tmp_path):
    """The train.py checkpoint window in order: maybe_promote_best (its
    own save to best/), save to last/, save_meta — three queued tasks on
    one worker; all must land and stay distinguishable."""
    ckpt = CheckpointManager(str(tmp_path), "ckpt", use_async=True)
    meta = {"best_t": [], "counters": {"t": 4, "epoch": 0}}
    assert ckpt.maybe_promote_best(meta, {"w": jnp.asarray([1.0])}, 0.5,
                                   metric="val_sg_iou")
    ckpt.save({"w": jnp.asarray([2.0])})
    ckpt.save_meta(meta)
    ckpt.wait()
    best = ckpt.restore({"w": jnp.zeros(1)}, best=True)
    last = ckpt.restore({"w": jnp.zeros(1)})
    assert float(best["w"][0]) == 1.0 and float(last["w"][0]) == 2.0
    assert ckpt.load_meta()["best_t"] == [4]


def test_background_failure_surfaces(tmp_path):
    ckpt = CheckpointManager(str(tmp_path), "ckpt", use_async=True)

    def boom(path, item, **kw):
        raise RuntimeError("disk on fire")

    ckpt._ckptr.save = boom
    ckpt.save({"w": jnp.zeros(4)})
    with pytest.raises(RuntimeError, match="disk on fire"):
        ckpt.wait()
    # Once raised, the error is consumed — the manager stays usable.
    ckpt.wait()


def test_restore_casts_flipped_optimizer_dtype(tmp_path, capsys):
    """ADVICE r4 #1 resume leg: a checkpoint saved with f32 Adam moments
    restored into an --adam_mu_dtype bfloat16 run must come back in the
    CONFIGURED dtype, with a warning — not silently flip optimizer-state
    precision mid-run."""
    ckpt = CheckpointManager(str(tmp_path), "ckpt", use_async=False)
    ckpt.save({"mu": jnp.full((4,), 0.25, jnp.float32)})
    restored = ckpt.restore({"mu": jnp.zeros(4, jnp.bfloat16)})
    assert restored["mu"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored["mu"], np.float32), 0.25)
    assert "checkpoint dtypes" in capsys.readouterr().out


def test_sigkill_mid_async_save_keeps_previous_durable(tmp_path):
    """SIGKILL lands while the t=4 async save is mid-write (stalled inside
    the background worker). The t=2 state + meta pair must remain the
    durable, restorable record: Orbax commits atomically and the meta
    write queues strictly behind the state commit, so a torn async save
    can never advance counters past the weights."""
    out_dir = str(tmp_path / "run")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen([sys.executable, WORKER, out_dir],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True, env=env)
    try:
        seen = []
        for line in proc.stdout:
            seen.append(line.strip())
            if "ASYNC_PENDING" in line:
                break
        else:
            pytest.fail(f"worker exited early: {seen}")
        assert any("DURABLE_T2" in s for s in seen)
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()

    ckpt = CheckpointManager(out_dir, "checkpoint", use_async=False)
    assert ckpt.has_checkpoint()
    assert ckpt.load_meta()["counters"]["t"] == 2
    restored = ckpt.restore({"w": jnp.zeros(256, jnp.float32)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), 2.0)
