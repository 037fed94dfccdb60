"""Spawned worker for the N-process train-CLI tests (tests/test_multihost.py).

Unlike _mh_worker.py (library-level step), this drives train.main()
itself: per-process loader slices, global-batch assembly inside the
prefetch stream, the jitted step over the global mesh, the
process-0-only TensorBoard writer (exercising parallel.local_slice on
non-fully-addressable batch/metrics arrays), check_model over assembled
val batches, and primary-only checkpoint writes.

argv: <pid> <port> <out_dir> [<num_processes>=2] [<local_devices>=2]
The 4-process variant exercises >2-process writer-exclusion barriers and
4-way loader slicing (2 rows per process at batch 8).

Prints ``RESULT <pid> <final_total_loss> <resumed_total_loss>``.
"""
import os
import sys

# Device count must be pinned BEFORE importing jax; CPU backend forced
# after import (the axon site hook ignores the env var).
_LOCAL_DEVICES = int(sys.argv[5]) if len(sys.argv) > 5 else 2
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={_LOCAL_DEVICES}")
os.environ.pop("JAX_PLATFORMS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    nproc = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * _LOCAL_DEVICES

    import scene_generation_tpu.train as train_mod
    n_dev = nproc * _LOCAL_DEVICES
    batch = max(4, n_dev)
    spe = 8 // batch  # steps per epoch at --synthetic_size 8
    common = ["--synthetic", "--tiny", "--print_every", "2",
              "--checkpoint_every", "2", "--synthetic_size", "8",
              "--batch_size", str(batch),
              "--output_dir", out]
    state, meta = train_mod.main(common + ["--num_iterations", "4"])
    assert meta["counters"] == {"t": 4, "epoch": 4 // spe}, meta["counters"]

    # Resume leg: has_checkpoint() must reach a GLOBAL yes (allgathered
    # flags over the shared dir) and restore() runs Orbax's all-process
    # barrier with every process participating.
    state2, meta2 = train_mod.main(
        common + ["--num_iterations", "6", "--restore_from_checkpoint", "1"])
    assert meta2["counters"] == {"t": 6, "epoch": 6 // spe}, meta2["counters"]

    print(f"RESULT {pid} {meta['losses']['total_loss'][-1]:.6f} "
          f"{meta2['losses']['total_loss'][-1]:.6f}", flush=True)


if __name__ == "__main__":
    main()
