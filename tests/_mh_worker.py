"""Spawned worker for the 2-process distributed-CPU test
(tests/test_multihost.py). Each process gets 4 virtual CPU devices; the
two form one 8-device global mesh via jax.distributed, each loads its half
of every global batch, and the pair runs ONE full adversarial train step.

Prints ``RESULT <pid> <total_loss>`` on success.
"""
import os
import sys

# 4 LOCAL devices per process (override the parent suite's 8) and CPU
# backend forced after import (the axon site hook ignores the env var).
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    from scene_generation_tpu.config import tiny_config
    from scene_generation_tpu.data.loader import DataLoader
    from scene_generation_tpu.data.synthetic import SyntheticDataset
    from scene_generation_tpu.parallel import (
        create_mesh, replicate_state, shard_batch)
    from scene_generation_tpu.trainer import create_train_state
    from scene_generation_tpu.trainer.step import make_train_step

    cfg = tiny_config()
    dset = SyntheticDataset(cfg, size=16, seed=0)
    loader = DataLoader(dset, batch_size=8, max_objs=cfg.data.max_objs,
                        max_triples=cfg.data.max_triples, shuffle=True,
                        num_workers=2, seed=0,
                        process_count=2, process_index=pid)
    local_batch = next(iter(loader))
    assert local_batch.imgs.shape[0] == 4, "loader must yield the local half"

    mods, state = create_train_state(cfg, jax.random.PRNGKey(0), local_batch,
                                     load_vgg=False)
    mesh = create_mesh()
    assert mesh.devices.size == 8
    state = replicate_state(state, mesh)
    global_batch = shard_batch(local_batch, mesh)
    assert global_batch.imgs.shape[0] == 8, "assembly must be GLOBAL"
    assert len(global_batch.imgs.sharding.device_set) == 8

    step = make_train_step(mods, donate=False)
    new_state, metrics = step(state, global_batch)
    jax.block_until_ready(metrics)
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss)
    assert int(new_state.step) == 1

    # TB image-panel path: metrics/batch leaves are global arrays spanning
    # non-addressable devices; local_slice must still yield one example.
    from scene_generation_tpu.parallel import local_slice
    assert not global_batch.imgs.is_fully_addressable
    sample = np.asarray(local_slice(metrics["_imgs_pred"])[0])
    assert sample.shape == metrics["_imgs_pred"].shape[1:]
    assert np.isfinite(sample).all()

    # check_model over assembled global batches WITH an inception-style
    # probs_fn: its (N, K) output is batch-sharded across both processes,
    # and evaluation.py must all-gather it (not np.asarray the global
    # array) so BOTH processes compute the same score.
    import jax.numpy as jnp
    from scene_generation_tpu.trainer.evaluation import check_model

    @jax.jit
    def probs_fn(imgs):
        logits = jnp.stack([imgs.mean(axis=(1, 2, 3)),
                            imgs.std(axis=(1, 2, 3))], axis=-1)
        return jax.nn.softmax(logits, axis=-1)

    eval_batches = (shard_batch(b, mesh) for b in loader)
    iou, imean, _, _, _ = check_model(mods, new_state, eval_batches,
                                      use_gt=True, num_samples=8,
                                      probs_fn=probs_fn)
    assert np.isfinite(iou) and np.isfinite(imean) and imean > 0.0

    print(f"RESULT {pid} {loss:.6f} {imean:.6f}", flush=True)


if __name__ == "__main__":
    main()
