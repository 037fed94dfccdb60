"""Epoch accounting under the cross-epoch prefetch stream (train.py).

Round 3 replaced the per-epoch `device_prefetch` teardown with ONE
stream spanning epochs (RESULTS.md §24). The prefetcher runs AHEAD of
consumption, so the loop tracks each consumed batch's epoch through a
side queue — this pins that the checkpoint's epoch counter still
reflects the batch actually consumed, across multiple tiny epochs.
"""
import json
import os

import scene_generation_tpu.train as train_mod


def test_epoch_counter_tracks_consumed_batches(tmp_path):
    out = str(tmp_path / "run")
    # tiny config: batch_size=4; synthetic_size=8 -> 2 steps/epoch.
    # 5 iterations span epochs 1,1,2,2,3 -> final counters epoch == 3.
    train_mod.main(["--synthetic", "--tiny", "--num_iterations", "5",
                    "--print_every", "5", "--checkpoint_every", "100",
                    "--output_dir", out, "--synthetic_size", "8"])
    meta = json.load(open(os.path.join(out, "checkpoint", "meta.json")))
    assert meta["counters"] == {"t": 5, "epoch": 3}, meta["counters"]
