"""--preset quality must reproduce the validated r4_repl configuration.

The bare CLI defaults are reference parity and a documented quality
foot-gun (ReLU box head collapse, gated box loss — RESULTS.md); every
quality claim rests on the r3_final/r4_repl config. The preset is the
one-flag path to it.
"""
import json
import os

from scene_generation_tpu.train import config_from_args, parse_args

R4_REPL_ARGS = os.path.join(os.path.dirname(__file__), "..",
                            "runs", "r4_repl", "args.json")


def _r4_repl_namespace():
    with open(R4_REPL_ARGS) as f:
        recorded = json.load(f)
    argv = ["--synthetic"]
    a = parse_args(argv)
    for k, v in recorded.items():
        setattr(a, k, v)
    return a


def test_quality_preset_matches_r4_repl_config():
    import dataclasses
    preset = parse_args(["--preset", "quality", "--synthetic"])
    repl = _r4_repl_namespace()
    cfg_p = config_from_args(preset)
    cfg_r = config_from_args(repl)
    # scan_blocks is the single intended difference: perf-only (unrolled is
    # +22% train throughput, math-identical), recorded in checkpoint meta.
    assert cfg_p.model.scan_blocks is False and cfg_r.model.scan_blocks
    cfg_r = cfg_r.replace(
        model=dataclasses.replace(cfg_r.model, scan_blocks=False),
        # num_val_samples is run sizing (r4_repl evaluated a 240-image
        # subset), not part of the quality configuration.
        data=dataclasses.replace(cfg_r.data,
                                 num_val_samples=cfg_p.data.num_val_samples))
    assert cfg_p.model == cfg_r.model
    assert cfg_p.loss == cfg_r.loss
    assert cfg_p.data == cfg_r.data
    assert cfg_p.train.learning_rate == cfg_r.train.learning_rate
    assert cfg_p.train.mask_learning_rate == cfg_r.train.mask_learning_rate
    assert preset.synthetic_size == repl.synthetic_size == 4096
    assert preset.box_net_final == "none"
    assert preset.box_loss_gated == 0
    assert preset.compute_dtype == "bfloat16"
    # Second intended difference vs r4_repl (which ran f32 moments):
    # bf16 Adam mu, promoted after the r5_b24 quality run passed with it
    # ON (RESULTS §39) — storage-only, bandwidth-exact (§35).
    assert preset.adam_mu_dtype == "bfloat16"
    assert repl.adam_mu_dtype in ("", "float32")


def test_explicit_flag_overrides_preset():
    a = parse_args(["--preset", "quality", "--synthetic",
                    "--box_net_final", "relu", "--synthetic_size", "64"])
    assert a.box_net_final == "relu"
    assert a.synthetic_size == 64
    assert a.box_loss_gated == 0  # untouched preset default still applies


def test_parity_preset_is_reference_defaults():
    a = parse_args(["--synthetic"])
    assert a.box_net_final == "relu"
    assert a.box_loss_gated == 1
    assert a.compute_dtype == "float32"
    assert a.synthetic_size == 512


R5_B24_ARGS = os.path.join(os.path.dirname(__file__), "..",
                           "runs", "r5_b24", "args.json")


def test_throughput_preset_matches_r5_b24_config():
    """--preset throughput must reproduce the validated runs/r5_b24
    configuration (RESULTS §39): quality + batch 24 + sqrt-scaled lr +
    bf16 Adam mu."""
    with open(R5_B24_ARGS) as f:
        recorded = json.load(f)
    a = parse_args(["--preset", "throughput", "--synthetic"])
    for k in ("batch_size", "learning_rate", "mask_learning_rate",
              "adam_mu_dtype", "box_net_final", "box_loss_gated",
              "compute_dtype", "synthetic_size"):
        assert getattr(a, k) == recorded[k], k
    # run sizing (iterations, val subset, logging cadence) is not part of
    # the preset; everything quality-relevant above is.


def test_tiny_path_propagates_optimizer_flags():
    """--tiny used to drop the optimizer-dtype and lr flags on the floor
    (caught by an end-to-end preset smoke: args.json said bfloat16 mu,
    the live train state was f32)."""
    a = parse_args(["--preset", "quality", "--synthetic", "--tiny",
                    "--learning_rate", "3e-4", "--grads_dtype", "bfloat16"])
    cfg = config_from_args(a)
    assert cfg.train.adam_mu_dtype == "bfloat16"
    assert cfg.train.grads_dtype == "bfloat16"
    assert cfg.train.learning_rate == 3e-4


def test_throughput_preset_explicit_override():
    a = parse_args(["--preset", "throughput", "--synthetic",
                    "--batch_size", "48", "--adam_mu_dtype", ""])
    assert a.batch_size == 48
    assert a.adam_mu_dtype == ""
    assert a.learning_rate == 1.41e-4  # untouched preset default applies
