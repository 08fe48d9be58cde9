"""Trimmed CI variant of the film-scale soak (tools/soak.py).

The full soak (`python -m facerec_tpu.tools.soak --frames 100000`)
proves the reference's nominal ~180k-frame workload
(/root/reference/facerec/extract.py:209,266) survives in one process:
bounded RSS, monotone checkpoint progress, healthy output files.  This
trims the film so the same invariants run in CI.
"""
import os

import pytest

from facerec_tpu.tools.soak import run_soak


@pytest.mark.slow
def test_soak_trimmed(tmp_path):
    report = run_soak(
        str(tmp_path / "soak"), n_frames=2000, width=256, height=192,
        block_frames=64, checkpoint_every=4, fetch_every=4,
        rss_budget_gb=8.0)
    assert report["pass"], report["failures"]
    assert report["frames_processed"] == 2000
    # checkpoints actually sampled and advancing
    assert report["ckpt_samples"] >= 2
    first, last = report["ckpt_first_last"]
    assert first < last
    # the real loop produced real artifacts
    assert report["saved_boxes"] > 0
    assert report["n_face_images"] == report["saved_boxes"]
    assert report["features_bytes"] > 0
    assert os.path.exists(f"{tmp_path}/soak/soak_report.json")


@pytest.mark.slow
def test_soak_smoke(tmp_path):
    """Fast plumbing check: tiny film, images off, rgb wire."""
    report = run_soak(
        str(tmp_path / "soak"), n_frames=300, width=192, height=144,
        block_frames=32, checkpoint_every=2, fetch_every=2,
        wire_format="rgb", save_images=False, decode_workers=0,
        rss_budget_gb=8.0)
    assert report["frames_processed"] == 300
    assert report["saved_boxes"] > 0
    assert report["pass"], report["failures"]
