"""--initial_eval runs check_model BEFORE the train loop (train.py).

Regression: `eval_iter` was defined after the `--initial_eval` block in
main(), so the documented flag crashed with UnboundLocalError after
dataset build + train-state init (reference train.py runs its initial
check_model the same way, before the epoch loop).
"""
import json
import os

import scene_generation_tpu.train as train_mod


def test_initial_eval_flag_runs(tmp_path, capsys):
    out = str(tmp_path / "run")
    train_mod.main(["--synthetic", "--tiny", "--num_iterations", "2",
                    "--print_every", "2", "--checkpoint_every", "100",
                    "--output_dir", out, "--synthetic_size", "8",
                    "--initial_eval", "1"])
    text = capsys.readouterr().out
    assert "initial: val-gt iou" in text
    meta = json.load(open(os.path.join(out, "checkpoint", "meta.json")))
    assert meta["counters"]["t"] == 2
