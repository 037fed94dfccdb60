"""scripts/noise_band.py — the multi-seed eval aggregator behind RESULTS
§33's protocol-noise table (VERDICT r3 weak #2). Pure-CPU: builds fake
eval_summary.json dirs and checks mean/std/min/max and missing-metric
handling."""
import json
import subprocess
import sys


def _write_summary(d, sg_iou, fid_sg=None):
    s = {"samples_sg": {"avg_iou": sg_iou, "recall@0.5": 0.1,
                        "recall@0.3": 0.4},
         "samples_gtattr": {"avg_iou": 0.4, "recall@0.5": 0.3,
                            "recall@0.3": 0.7}}
    if fid_sg is not None:
        s["fid_sg"] = {"fid": fid_sg}
    (d / "eval_summary.json").write_text(json.dumps(s))


def test_noise_band_aggregation(tmp_path):
    d1, d2, d3 = (tmp_path / n for n in ("a", "b", "c"))
    for d in (d1, d2, d3):
        d.mkdir()
    # fid_sg present in only two dirs — the aggregator must use n=2 for
    # that row instead of crashing or padding.
    _write_summary(d1, 0.30, fid_sg=2.0)
    _write_summary(d2, 0.32, fid_sg=4.0)
    _write_summary(d3, 0.34)
    out = tmp_path / "band.json"
    r = subprocess.run(
        [sys.executable, "scripts/noise_band.py",
         str(d1), str(d2), str(d3), "--out_json", str(out)],
        capture_output=True, text=True, check=True)
    assert "| sg IoU |" in r.stdout
    band = json.loads(out.read_text())["metrics"]
    iou = band["sg IoU"]
    assert iou["n"] == 3
    assert abs(iou["mean"] - 0.32) < 1e-12
    assert abs(iou["std"] - 0.02) < 1e-12          # sample std, n-1
    assert (iou["min"], iou["max"]) == (0.30, 0.34)
    fid = band["FID sg (rel)"]
    assert fid["n"] == 2 and abs(fid["mean"] - 3.0) < 1e-12
