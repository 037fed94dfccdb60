"""Spawned worker for the 2-process train-CLI test (tests/test_multihost.py).

Unlike _mh_worker.py (library-level step), this drives train.main()
itself: per-process loader halves, global-batch assembly inside the
prefetch stream, the jitted step over the 4-device global mesh, the
process-0-only TensorBoard writer (exercising parallel.local_slice on
non-fully-addressable batch/metrics arrays), check_model over assembled
val batches, and primary-only checkpoint writes.

Prints ``RESULT <pid> <final_total_loss>`` on success.
"""
import os
import sys

# 2 LOCAL devices per process -> one 4-device global mesh (batch 4 must
# divide the device count); CPU backend forced after import (the axon
# site hook ignores the env var).
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    import scene_generation_tpu.train as train_mod
    common = ["--synthetic", "--tiny", "--print_every", "2",
              "--checkpoint_every", "2", "--synthetic_size", "8",
              "--output_dir", out]
    state, meta = train_mod.main(common + ["--num_iterations", "4"])
    assert meta["counters"] == {"t": 4, "epoch": 2}, meta["counters"]

    # Resume leg: has_checkpoint() must reach a GLOBAL yes (allgathered
    # flags over the shared dir) and restore() runs Orbax's all-process
    # barrier with every process participating.
    state2, meta2 = train_mod.main(
        common + ["--num_iterations", "6", "--restore_from_checkpoint", "1"])
    assert meta2["counters"] == {"t": 6, "epoch": 3}, meta2["counters"]

    print(f"RESULT {pid} {meta['losses']['total_loss'][-1]:.6f} "
          f"{meta2['losses']['total_loss'][-1]:.6f}", flush=True)


if __name__ == "__main__":
    main()
