"""The training loop's NaN gate: a non-finite loss at a print step aborts
with FloatingPointError, dumps the poisoned state under *_nan_abort, and
leaves the regular checkpoint name untouched."""
import os

import jax.numpy as jnp
import pytest

import scene_generation_tpu.train as train_mod


def test_nan_aborts_and_dumps(tmp_path, monkeypatch):
    real_make = train_mod.make_train_step

    def poisoned_make(mods, donate=True):
        step = real_make(mods, donate=donate)

        def wrapped(state, batch):
            state, metrics = step(state, batch)
            # Poison from step 2 on (state.step is already incremented).
            bad = jnp.where(state.step >= 2, jnp.nan, 0.0)
            metrics = dict(metrics)
            metrics["total_loss"] = metrics["total_loss"] + bad
            return state, metrics

        return wrapped

    monkeypatch.setattr(train_mod, "make_train_step", poisoned_make)
    out = str(tmp_path / "run")
    with pytest.raises(FloatingPointError, match="non-finite"):
        train_mod.main(["--synthetic", "--tiny", "--num_iterations", "4",
                        "--print_every", "2", "--checkpoint_every", "100",
                        "--output_dir", out, "--synthetic_size", "8"])
    names = os.listdir(out)
    assert any("nan_abort" in n for n in names), names
