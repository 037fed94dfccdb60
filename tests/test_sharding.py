"""Multi-device data-parallel tests on the 8-way virtual CPU mesh
(SURVEY.md §4 implication (d))."""
import numpy as np
import jax
import jax.numpy as jnp

from scene_generation_tpu.config import tiny_config
from scene_generation_tpu.data import synthetic_batch
from scene_generation_tpu.parallel import (
    create_mesh, replicate_state, shard_batch)
from scene_generation_tpu.trainer import create_train_state
from scene_generation_tpu.trainer.step import make_train_step


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8


def test_data_parallel_train_step():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, seed=0, batch_size=8)
    mods, state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                     load_vgg=False)
    mesh = create_mesh()
    state = replicate_state(state, mesh)
    sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
    # Batch really is split across devices.
    assert len(sharded.imgs.sharding.device_set) == 8

    step = make_train_step(mods, donate=False)
    new_state, metrics = step(state, sharded)
    for k, v in metrics.items():
        if k.startswith("_"):
            continue
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1


def test_sharded_matches_single_device():
    """The pjit'd step must compute the same numbers as one device."""
    cfg = tiny_config()
    batch = synthetic_batch(cfg, seed=1, batch_size=8)
    mods, state0 = create_train_state(cfg, jax.random.PRNGKey(3), batch,
                                      load_vgg=False)
    step = make_train_step(mods, donate=False)

    _, m_single = step(state0, jax.tree.map(jnp.asarray, batch))

    mesh = create_mesh()
    state_r = replicate_state(state0, mesh)
    _, m_shard = step(state_r, shard_batch(jax.tree.map(jnp.asarray, batch),
                                           mesh))
    for k in m_single:
        if k.startswith("_"):
            continue
        np.testing.assert_allclose(float(m_single[k]), float(m_shard[k]),
                                   rtol=2e-3, atol=1e-5, err_msg=k)
