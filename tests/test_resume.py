"""Checkpoint -> resume reproduces the uninterrupted run EXACTLY.

SURVEY.md §5 failure detection/recovery: preemption checkpoints must let
--restore_from_checkpoint continue as if never stopped. Everything that
feeds the step is restored state (params, 4 optimizer states, BN stats,
replay pool, rng for the use_gt coin + mask noise) or a pure function of
(seed, epoch) (the data stream), so a run interrupted at an epoch
boundary and resumed must match the straight-through run bit-for-bit.
"""
import jax
import numpy as np

import scene_generation_tpu.train as train_mod

# tiny config: batch_size=4; --synthetic_size 8 -> 2 steps/epoch, so
# t=2 is an epoch boundary (resume restarts the data stream at the NEXT
# epoch, matching the reference's fresh-loader-on-resume behavior).
COMMON = ["--synthetic", "--tiny", "--print_every", "2",
          "--checkpoint_every", "2", "--synthetic_size", "8"]


def test_resume_matches_uninterrupted(tmp_path):
    out_a = str(tmp_path / "straight")
    state_a, meta_a = train_mod.main(
        COMMON + ["--num_iterations", "4", "--output_dir", out_a])

    out_b = str(tmp_path / "resumed")
    train_mod.main(COMMON + ["--num_iterations", "2", "--output_dir", out_b])
    state_b, meta_b = train_mod.main(
        COMMON + ["--num_iterations", "4", "--output_dir", out_b,
                  "--restore_from_checkpoint", "1"])

    assert meta_b["counters"] == meta_a["counters"] == {"t": 4, "epoch": 2}
    leaves_a = jax.tree.leaves(jax.device_get(state_a))
    leaves_b = jax.tree.leaves(jax.device_get(state_b))
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # Loss history: the resumed run replays the same t=4 print window.
    assert meta_b["losses"]["total_loss"][-1] == \
        meta_a["losses"]["total_loss"][-1]
