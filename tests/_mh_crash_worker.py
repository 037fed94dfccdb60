"""Spawned worker for checkpoint FAULT-INJECTION tests
(tests/test_checkpoint_fault_injection.py).

Modes (argv[4]):
  kill_nonwriter        process 1 SIGKILLs itself at its 2nd periodic
                        save() entry (t=4) — while process 0 is inside the
                        same checkpoint block actually writing. Proves the
                        §27 design: the writer's Orbax save is scoped to
                        active_processes={0}, so a dead peer cannot
                        deadlock it.
  kill_writer_before_meta
                        process 0 SIGKILLs itself at its 2nd save_meta()
                        entry, AFTER waiting for the t=4 state commit —
                        the exact §27 meta-ordering window (state durable,
                        counters not yet advanced). The durable directory
                        must remain restorable from the t=2 meta.
  resume                both processes restart and resume from the last
                        durable checkpoint, training to t=6.

Prints ``RESULT <pid> <t> <epoch>`` (resume) or ``RESULT <pid> ok``
(survivors of a crash phase), then os._exit(0) so a dead peer cannot hang
interpreter teardown.
"""
import os
import signal
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, port, out, mode = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                            sys.argv[4])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    import scene_generation_tpu.train as train_mod
    from scene_generation_tpu.trainer.checkpoint import CheckpointManager

    common = ["--synthetic", "--tiny", "--print_every", "2",
              "--checkpoint_every", "2", "--synthetic_size", "8",
              "--output_dir", out]

    if mode == "resume":
        _, meta = train_mod.main(
            common + ["--num_iterations", "6",
                      "--restore_from_checkpoint", "1"])
        print(f"RESULT {pid} {meta['counters']['t']} "
              f"{meta['counters']['epoch']}", flush=True)
        os._exit(0)

    calls = {"save": 0, "meta": 0}
    if mode == "kill_nonwriter" and pid == 1:
        orig_save = CheckpointManager.save

        def save(self, state, best=False):
            if not best:
                calls["save"] += 1
                if calls["save"] >= 2:
                    os.kill(os.getpid(), signal.SIGKILL)
            return orig_save(self, state, best=best)

        CheckpointManager.save = save
    elif mode == "kill_writer_before_meta" and pid == 0:
        orig_meta = CheckpointManager.save_meta

        def save_meta(self, meta):
            calls["meta"] += 1
            if calls["meta"] >= 2:
                self.wait()  # t=4 state committed; meta NOT yet advanced
                os.kill(os.getpid(), signal.SIGKILL)
            return orig_meta(self, meta)

        CheckpointManager.save_meta = save_meta

    train_mod.main(common + ["--num_iterations", "4"])
    print(f"RESULT {pid} ok", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
