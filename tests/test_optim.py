"""Executable proofs for the Adam moment-storage dtype constraints.

trainer/optim.py adds ``nu_dtype`` to Adam (optax only exposes
``mu_dtype``) as an HBM byte-removal lever for the bandwidth-bound train
step (RESULTS §30). These tests pin, with real update loops rather than
docstring arithmetic:

1. adam_storage(nu_dtype=None) is BIT-IDENTICAL to optax.adam — the
   custom transform is a strict superset, not a re-derivation drift risk.
2. bfloat16 nu FREEZES at b2=0.999: it stalls short of steady state under
   a constant gradient and — worse — cannot decay after the gradient goes
   quiet, permanently suppressing later updates. This is why
   --adam_nu_dtype bfloat16 is documented as an A/B-record-only setting.
3. float16 nu accumulates (resolution 2^-11 < the 1e-3 per-step
   increment) but UNDERFLOWS to zero for sustained |g| below ~2e-4,
   the documented range hazard.

Reference parity baseline: torch Adam keeps both moments f32
(reference trainer.py:60,80,106,133).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from scene_generation_tpu.trainer.optim import adam_storage, scale_by_adam_storage


def _run(tx, grads_fn, n_steps, params):
    state = tx.init(params)
    for t in range(n_steps):
        updates, state = tx.update(grads_fn(t), state, params)
        params = optax.apply_updates(params, updates)
    return params, state


def test_bit_identical_to_optax_adam_when_f32():
    params = {"w": jnp.linspace(-1.0, 1.0, 32), "b": jnp.ones((4,))}
    key = jax.random.PRNGKey(0)
    grads = [
        {"w": jax.random.normal(jax.random.fold_in(key, t), (32,)) * 0.1,
         "b": jax.random.normal(jax.random.fold_in(key, 100 + t), (4,))}
        for t in range(20)
    ]
    ref, ref_state = _run(optax.adam(1e-3, b1=0.5, b2=0.999),
                          lambda t: grads[t], 20, params)
    got, got_state = _run(adam_storage(1e-3, b1=0.5, b2=0.999),
                          lambda t: grads[t], 20, params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]))
    np.testing.assert_array_equal(np.asarray(ref_state[0].nu[k]),
                                  np.asarray(got_state[0].nu[k]))


def test_bf16_nu_stalls_below_steady_state_and_cannot_decay():
    """Constant g=1.0 for 3000 steps: f32 nu -> ~1.0 (bias-uncorrected
    steady state g^2), bf16 nu stalls well short because the per-step
    increment (1-b2)*(g^2 - nu) ~ 1e-3*nu drops below bf16's half-ulp.
    Then 2000 zero-grad steps: f32 nu decays by 0.999^2000 ~ 0.135,
    bf16 nu stays FROZEN at its historical value."""
    tx = scale_by_adam_storage(b1=0.5, b2=0.999, nu_dtype=jnp.bfloat16)
    ref = scale_by_adam_storage(b1=0.5, b2=0.999)
    p = {"w": jnp.zeros((8,))}
    g_hot = {"w": jnp.ones((8,))}
    g_zero = {"w": jnp.zeros((8,))}

    s_bf, s_f32 = tx.init(p), ref.init(p)
    step_bf = jax.jit(lambda g, s: tx.update(g, s, p)[1])
    step_f32 = jax.jit(lambda g, s: ref.update(g, s, p)[1])
    for _ in range(3000):
        s_bf, s_f32 = step_bf(g_hot, s_bf), step_f32(g_hot, s_f32)
    nu_bf_hot = float(s_bf.nu["w"][0])
    nu_f32_hot = float(s_f32.nu["w"][0])
    assert nu_f32_hot > 0.93          # ~1 - 0.999^3000 = 0.95
    assert nu_bf_hot < 0.80           # stalled: increments round to zero

    for _ in range(2000):
        s_bf, s_f32 = step_bf(g_zero, s_bf), step_f32(g_zero, s_f32)
    nu_bf_cold = float(s_bf.nu["w"][0])
    nu_f32_cold = float(s_f32.nu["w"][0])
    assert nu_f32_cold < 0.20 * nu_f32_hot   # decayed by 0.999^2000
    assert nu_bf_cold == nu_bf_hot           # FROZEN: decay rounds to zero


def test_f16_nu_accumulates_but_underflows_small_gradients():
    tx = scale_by_adam_storage(b1=0.5, b2=0.999, nu_dtype=jnp.float16)
    p = {"w": jnp.zeros((4,))}

    # Moderate gradients: f16 tracks f32 within a few percent.
    s = tx.init(p)
    step = jax.jit(lambda g, s: tx.update(g, s, p)[1])
    g = {"w": jnp.full((4,), 0.1)}
    for _ in range(2000):
        s = step(g, s)
    nu = float(s.nu["w"][0])
    assert abs(nu - 0.01 * (1 - 0.999 ** 2000)) < 0.15 * 0.01

    # Sustained |g| = 1e-4: per-step increment (1-b2)*g^2 = 1e-11 is far
    # below f16's smallest denormal (~6e-8) -> nu never leaves zero.
    s = tx.init(p)
    g_tiny = {"w": jnp.full((4,), 1e-4)}
    for _ in range(500):
        s = step(g_tiny, s)
    assert float(jnp.max(jnp.abs(s.nu["w"]))) == 0.0


def test_state_tree_matches_optax_adam_for_checkpoints():
    """Same pytree structure as optax.adam so checkpoints interchange
    regardless of which transform built the state."""
    p = {"w": jnp.zeros((3,))}
    a = optax.adam(1e-3, b1=0.5, b2=0.999).init(p)
    b = adam_storage(1e-3, b1=0.5, b2=0.999,
                     nu_dtype=jnp.bfloat16).init(p)
    assert (jax.tree_util.tree_structure(a) ==
            jax.tree_util.tree_structure(b))
