"""Evaluation-path tests: check_model end-to-end and deterministic sampling
under fixed PRNG keys (SURVEY.md §4 implication (e))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scene_generation_tpu.config import tiny_config
from scene_generation_tpu.data import synthetic_batch
from scene_generation_tpu.data.synthetic import SyntheticDataset
from scene_generation_tpu.data.loader import DataLoader
from scene_generation_tpu.trainer import create_train_state
from scene_generation_tpu.trainer.evaluation import check_model, make_eval_step


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, seed=0)
    mods, state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                     load_vgg=False)
    return cfg, mods, state


def test_check_model_both_modes(setup):
    cfg, mods, state = setup
    dset = SyntheticDataset(cfg, size=8, seed=9)
    loader = DataLoader(dset, batch_size=4, max_objs=cfg.data.max_objs,
                        max_triples=cfg.data.max_triples, shuffle=False)
    for use_gt in (True, False):
        iou, imean, istd, r05, r03 = check_model(
            mods, state, iter(loader), use_gt=use_gt, num_samples=8)
        assert 0.0 <= iou <= 1.0
        assert 0.0 <= r05 <= 1.0 and 0.0 <= r03 <= 1.0
    # With a probs_fn the inception score is produced.
    fake_probs = lambda imgs: np.full((imgs.shape[0], 10), 0.1, np.float32)
    _, imean, _, _, _ = check_model(mods, state, iter(loader), use_gt=True,
                                    num_samples=8, probs_fn=fake_probs)
    assert abs(imean - 1.0) < 1e-4


def test_sampling_deterministic_under_fixed_key(setup):
    cfg, mods, state = setup
    batch = synthetic_batch(cfg, seed=4)
    step = make_eval_step(mods, use_gt=False)
    noise = jax.random.normal(jax.random.PRNGKey(42),
                              (cfg.model.mask_noise_dim,))
    img1, *_ = step(state, batch, noise)
    img2, *_ = step(state, batch, noise)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    # Different key -> different image (noise actually matters).
    noise3 = jax.random.normal(jax.random.PRNGKey(7),
                               (cfg.model.mask_noise_dim,))
    img3, *_ = step(state, batch, noise3)
    assert float(np.abs(np.asarray(img1) - np.asarray(img3)).max()) > 0
