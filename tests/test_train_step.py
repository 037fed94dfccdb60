"""End-to-end train-step tests on the tiny config (SURVEY.md §4 (c)/(e))."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_generation_tpu.config import tiny_config
from scene_generation_tpu.data import synthetic_batch
from scene_generation_tpu.trainer import create_train_state, pool_query
from scene_generation_tpu.trainer.pools import create_pool
from scene_generation_tpu.trainer.step import make_train_step


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, seed=0)
    mods, state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                     load_vgg=False)
    step = make_train_step(mods, donate=False)
    states = [state]
    metrics = []
    for i in range(3):
        s, m = step(states[-1], synthetic_batch(cfg, seed=i))
        states.append(s)
        metrics.append(m)
    return cfg, states, metrics


def test_step_counter_and_finiteness(trained):
    _, states, metrics = trained
    assert int(states[-1].step) == 3
    for m in metrics:
        for k, v in m.items():
            if k.startswith("_"):
                continue
            assert np.isfinite(float(v)), f"{k} not finite"


def test_all_params_update(trained):
    _, states, _ = trained
    before, after = states[0], states[1]

    def frac_changed(a, b):
        leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
        changed = sum(float(np.any(np.asarray(x) != np.asarray(y)))
                      for x, y in zip(leaves_a, leaves_b))
        return changed / max(1, len(leaves_a))

    assert frac_changed(before.g_params, after.g_params) > 0.9
    assert frac_changed(before.d_img_params, after.d_img_params) > 0.9
    assert frac_changed(before.d_obj_params, after.d_obj_params) > 0.9
    assert frac_changed(before.d_mask_params, after.d_mask_params) > 0.9


def test_pool_populates(trained):
    _, states, _ = trained
    assert int((np.asarray(states[-1].pool.counts) > 0).sum()) > 0


def test_pool_query_semantics():
    pool = create_pool(num_classes=3, pool_size=2, rep_size=4)
    rng = jax.random.PRNGKey(0)
    objs = jnp.asarray([1, 1, 2], jnp.int32)
    reprs = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    mask = jnp.ones((3,))
    wrong, pool = pool_query(pool, rng, objs, reprs, mask)
    # Empty pool: returns the object's own vector (utils.py:77-79).
    np.testing.assert_allclose(np.asarray(wrong), np.asarray(reprs))
    assert int(pool.counts[1]) == 2 and int(pool.counts[2]) == 1
    # Second query returns stored (previous) vectors, not the new ones.
    new_reprs = reprs + 100
    wrong2, pool = pool_query(pool, jax.random.PRNGKey(1), objs, new_reprs,
                              mask)
    assert float(np.abs(np.asarray(wrong2)).max()) < 100
    # Invalid rows neither read their class nor write.
    pool3 = create_pool(3, 2, 4)
    w3, pool3 = pool_query(pool3, rng, objs, reprs,
                           jnp.asarray([0.0, 0.0, 0.0]))
    assert int(pool3.counts.sum()) == 0


def test_pool_at_capacity_no_write_collision():
    """At capacity, same-class objects in one batch overwrite DISTINCT
    slots (per-class base + rank draw): every insert lands; no insert is
    lost to a colliding write (reference utils.py:85-88 keeps each
    sequential replace)."""
    P, k = 4, 4
    pool = create_pool(num_classes=2, pool_size=P, rep_size=1)
    mask = jnp.ones((k,))
    objs = jnp.full((k,), 1, jnp.int32)
    # Fill class 1 to capacity.
    fill = jnp.arange(k, dtype=jnp.float32).reshape(k, 1)
    _, pool = pool_query(pool, jax.random.PRNGKey(0), objs, fill, mask)
    assert int(pool.counts[1]) == P
    # At capacity: insert k fresh same-class vectors in ONE batch.
    for key in range(1, 6):
        fresh = jnp.arange(k, dtype=jnp.float32).reshape(k, 1) + 100 * key
        wrong, pool = pool_query(pool, jax.random.PRNGKey(key), objs, fresh,
                                 mask)
        got = sorted(float(v) for v in np.asarray(pool.vecs[1, :, 0]))
        want = sorted(float(v) for v in np.asarray(fresh[:, 0]))
        assert got == want, f"lost inserts at key={key}: {got} vs {want}"
        # Reads are the PREVIOUS batch's entries, each exactly once
        # (distinct slots), never the fresh inserts.
        prev = jnp.arange(k, dtype=jnp.float32) + 100 * (key - 1)
        np.testing.assert_array_equal(
            np.sort(np.asarray(wrong[:, 0])), np.asarray(prev))


def test_determinism():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, seed=5)
    outs = []
    for _ in range(2):
        mods, state = create_train_state(cfg, jax.random.PRNGKey(7), batch,
                                         load_vgg=False)
        step = make_train_step(mods, donate=False)
        _, m = step(state, batch)
        outs.append(float(m["total_loss"]))
    assert outs[0] == outs[1]


def test_box_loss_gating():
    """box_loss_gated=True (reference parity, trainer.py:210-216) zeroes
    bbox_pred on use_gt=0 steps; False supervises boxes every step."""
    import dataclasses
    cfg = tiny_config()
    batch = synthetic_batch(cfg, seed=3)

    # Find an rng whose in-step split yields use_gt == 0.
    key = None
    for seed in range(20):
        k = jax.random.PRNGKey(seed)
        _, _, r_gt, _ = jax.random.split(k, 4)
        if not bool(jax.random.bernoulli(r_gt)):
            key = k
            break
    assert key is not None

    losses = {}
    for gated in (True, False):
        c = cfg.replace(loss=dataclasses.replace(cfg.loss,
                                                 box_loss_gated=gated))
        mods, state = create_train_state(c, jax.random.PRNGKey(0), batch,
                                         load_vgg=False)
        state = state.replace(rng=key)
        step = make_train_step(mods, donate=False)
        _, m = step(state, batch)
        assert float(m["use_gt"]) == 0.0
        losses[gated] = float(m["bbox_pred"])
    assert losses[True] == 0.0
    assert losses[False] > 0.0


def test_layout_embed_dim_step():
    """Opt-in learned layout class embedding (config layout_embed_dim):
    full adversarial step runs, is finite, and the layout/D_img channel
    plumbing follows layout_nc. Reference-parity default (0 = one-hot) is
    covered by every other test."""
    import dataclasses
    cfg = tiny_config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                layout_embed_dim=8))
    assert cfg.model.layout_nc == 8 + cfg.model.rep_size
    batch = synthetic_batch(cfg, seed=1)
    mods, state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                     load_vgg=False)
    step = make_train_step(mods, donate=False)
    _, m = step(state, batch)
    for k, v in m.items():
        if k.startswith("_"):
            continue
        assert np.isfinite(float(v)), f"{k} not finite"
    assert m["_layout_one_hot"].shape[-1] == 8


def test_adam_mu_dtype_bfloat16():
    """Opt-in bf16 Adam first moment (TrainConfig.adam_mu_dtype): mu leaves
    are stored bf16, nu stays f32 (b2=0.999 increments are below bf16's
    2^-8 relative precision — a bf16 nu would stop accumulating), and a
    short trajectory stays close to the f32-mu reference. HBM byte-removal
    option for the bandwidth-bound step (RESULTS §30)."""
    import dataclasses
    import optax

    def run(mu_dtype, n_steps=4):
        cfg = tiny_config()
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, adam_mu_dtype=mu_dtype))
        batch = synthetic_batch(cfg, seed=3)
        mods, state = create_train_state(cfg, jax.random.PRNGKey(2), batch,
                                         load_vgg=False)
        step = make_train_step(mods, donate=False)
        for _ in range(n_steps):
            state, m = step(state, batch)
        return state, m

    state_bf16, m_bf16 = run("bfloat16")
    state_f32, m_f32 = run("")

    # Dtype placement: every mu leaf bf16, every nu leaf f32.
    adam_state = state_bf16.opt_g[0]
    assert isinstance(adam_state, optax.ScaleByAdamState)
    for leaf in jax.tree_util.tree_leaves(adam_state.mu):
        assert leaf.dtype == jnp.bfloat16, leaf.dtype
    for leaf in jax.tree_util.tree_leaves(adam_state.nu):
        assert leaf.dtype == jnp.float32, leaf.dtype
    # Params themselves stay f32 (master weights).
    for leaf in jax.tree_util.tree_leaves(state_bf16.g_params):
        assert leaf.dtype == jnp.float32, leaf.dtype

    # Trajectory closeness after a few steps: the bf16 mu rounds the
    # momentum buffer, not the gradients or params, so losses track.
    for k in ("total_loss", "bbox_pred"):
        a, b = float(m_bf16[k]), float(m_f32[k])
        assert np.isfinite(a) and np.isfinite(b)
        assert abs(a - b) <= 0.05 * max(1.0, abs(b)), (k, a, b)


def test_grads_dtype_and_nu_dtype_levers():
    """Opt-in byte-removal levers (RESULTS §37): grads_dtype=bfloat16 casts
    every grad tree at the backward->optimizer boundary (params and both
    moments keep their configured dtypes; trajectory stays close), and
    adam_nu_dtype=float16 stores nu in f16 via the custom transform
    (trainer/optim.py). Reference parity: both default off (torch Adam is
    all-f32, reference trainer.py:60)."""
    import dataclasses
    import optax

    def run(n_steps=4, **train_kw):
        cfg = tiny_config()
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))
        batch = synthetic_batch(cfg, seed=3)
        mods, state = create_train_state(cfg, jax.random.PRNGKey(2), batch,
                                         load_vgg=False)
        step = make_train_step(mods, donate=False)
        for _ in range(n_steps):
            state, m = step(state, batch)
        return state, m

    state_ref, m_ref = run()
    state_g, m_g = run(grads_dtype="bfloat16")
    state_nu, _ = run(adam_nu_dtype="float16")

    # grads cast is a boundary-only change: params + moments stay f32...
    adam_g = state_g.opt_g[0]
    assert isinstance(adam_g, optax.ScaleByAdamState)
    for tree in (state_g.g_params, adam_g.mu, adam_g.nu):
        for leaf in jax.tree_util.tree_leaves(tree):
            assert leaf.dtype == jnp.float32, leaf.dtype
    # ...and the short trajectory tracks the f32-grads reference.
    for k in ("total_loss", "bbox_pred"):
        a, b = float(m_g[k]), float(m_ref[k])
        assert np.isfinite(a) and np.isfinite(b)
        assert abs(a - b) <= 0.05 * max(1.0, abs(b)), (k, a, b)

    # nu_dtype places every nu leaf f16 across all four optimizers,
    # mu stays f32.
    for opt_state in (state_nu.opt_g, state_nu.opt_d_img,
                      state_nu.opt_d_obj, state_nu.opt_d_mask):
        adam = opt_state[0]
        for leaf in jax.tree_util.tree_leaves(adam.nu):
            assert leaf.dtype == jnp.float16, leaf.dtype
        for leaf in jax.tree_util.tree_leaves(adam.mu):
            assert leaf.dtype == jnp.float32, leaf.dtype


def test_remat_unrolled_is_semantically_noop():
    """remat_generator with UNROLLED blocks (the train.py default path,
    scan_blocks=0) must change only the bwd schedule, never the math:
    one train step with remat on/off produces identical metrics.
    (The scanned path got nn.remat in round 2; the unrolled wiring is
    round 5's last §30 byte-lever candidate, A/B'd in RESULTS §42.)"""
    import dataclasses
    cfg = tiny_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, scan_blocks=False))
    batch = synthetic_batch(cfg, seed=0)
    outs = {}
    for remat in (False, True):
        c = cfg.replace(model=dataclasses.replace(
            cfg.model, scan_blocks=False, remat_generator=remat))
        mods, state = create_train_state(c, jax.random.PRNGKey(0), batch,
                                         load_vgg=False)
        step = make_train_step(mods, donate=False)
        _, m = step(state, batch)
        outs[remat] = {k: float(v) for k, v in m.items()
                       if not k.startswith("_")}
    assert outs[False].keys() == outs[True].keys()
    for k in outs[False]:
        np.testing.assert_allclose(outs[True][k], outs[False][k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)
