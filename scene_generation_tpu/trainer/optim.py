"""Adam with independent STORAGE dtypes for each moment (HBM byte removal).

The train step is bandwidth-bound (RESULTS §30: ~95% of measured roofline
at batch 12), so the remaining wins come from removing persistent-state
bytes. optax.adam exposes ``mu_dtype`` only; this transform adds
``nu_dtype`` with the same contract — ALL math in the gradient dtype
(f32), only the stored moment is cast — and keeps optax's exact update
formulation and ``ScaleByAdamState`` tree so checkpoints and the
TrainState layout are unchanged.

Numerics of a low-precision SECOND moment (b2 = 0.999, reference
trainer.py:60): each update moves nu by ~1/1000 of its value, so the
storage format needs relative resolution well under 1e-3 or
round-to-nearest discards the increment entirely:

- bfloat16 (8 mantissa bits, half-ulp 2^-9 ≈ 2.0e-3): nu STALLS ~1/3
  short of steady state and — worse — can never decay once large: the
  0.999-decay decrement also rounds to zero, freezing nu at its
  historical maximum and permanently suppressing updates. Proven
  executable in tests/test_optim.py (was a docstring claim in
  train_state.py).
- float16 (10 mantissa bits, half-ulp 2^-11 ≈ 4.9e-4): increments and
  decays DO accumulate; the hazard is range — nu underflows to 0 for
  sustained |g| ≲ 2e-4 (f16 min normal 6.1e-5, denormals to 6e-8), after
  which 1/(sqrt(nu)+eps) explodes. Same 2-byte HBM win as bf16.

Reference parity: torch Adam keeps both moments f32
(reference trainer.py:60,80,106,133); dtype overrides are opt-in.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _cast(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree.map(lambda x: x.astype(dtype), tree)


def scale_by_adam_storage(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[jnp.dtype] = None,
    nu_dtype: Optional[jnp.dtype] = None,
) -> optax.GradientTransformation:
    """optax.scale_by_adam plus a ``nu_dtype`` storage override.

    Matches optax's formulation exactly (moment update in the promoted
    dtype of (grad, stored moment), bias correction by 1 - b^t, cast on
    store) so ``nu_dtype=None`` is bit-compatible with optax.adam.
    """
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype is not None else None
    nu_dtype = jnp.dtype(nu_dtype) if nu_dtype is not None else None

    def init_fn(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        # Accumulate in the promoted dtype (f32 grads promote a bf16/f16
        # stored moment), exactly as optax.tree_utils.tree_update_moment.
        mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g,
                          updates, state.mu)
        nu = jax.tree.map(lambda g, n: b2 * n + (1 - b2) * (g * g),
                          updates, state.nu)
        count_inc = optax.safe_int32_increment(state.count)
        mu_hat = optax.bias_correction(mu, b1, count_inc)
        nu_hat = optax.bias_correction(nu, b2, count_inc)
        new_updates = jax.tree.map(
            lambda m, v: m / (jnp.sqrt(v) + eps), mu_hat, nu_hat)
        return new_updates, optax.ScaleByAdamState(
            count=count_inc, mu=_cast(mu, mu_dtype), nu=_cast(nu, nu_dtype))

    return optax.GradientTransformation(init_fn, update_fn)


def adam_storage(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, mu_dtype=None, nu_dtype=None
                 ) -> optax.GradientTransformation:
    """Drop-in for ``optax.adam(lr, b1, b2, mu_dtype=...)`` with nu_dtype.

    Same chain shape (scale_by_adam, scale(-lr)) => same optimizer-state
    pytree as optax.adam, so checkpoints interchange.
    """
    return optax.chain(
        scale_by_adam_storage(b1=b1, b2=b2, eps=eps,
                              mu_dtype=mu_dtype, nu_dtype=nu_dtype),
        optax.scale(-learning_rate),
    )
