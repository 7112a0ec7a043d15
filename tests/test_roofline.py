"""Sanity tests for the analytic roofline cost models."""

import pytest

from quattro_tpu.utils import roofline


def test_riccati_step_flops_hand_count():
    # n=1, m=1: 4 + 6 + 4 + 2 + 2 + 1/3 + 4 = 22.33...
    assert roofline.riccati_step_flops(1, 1) == pytest.approx(22.3333, abs=1e-3)
    # Dominant n^3 term at flagship dims (4n^3 plus ~70% lower-order).
    n, m = 12, 4
    val = roofline.riccati_step_flops(n, m)
    assert 4 * n**3 < val < 8 * n**3


def test_riccati_totals_scale_linearly():
    one = roofline.riccati_flops(100, 12, 4)
    assert roofline.riccati_flops(200, 12, 4) == pytest.approx(2 * one)
    assert roofline.riccati_flops(100, 12, 4, batch=8) == pytest.approx(8 * one)
    b1 = roofline.riccati_bytes(100, 12, 4)
    assert roofline.riccati_bytes(100, 12, 4, batch=3) == pytest.approx(3 * b1)
    assert roofline.riccati_bytes(100, 12, 4, carry_in_hbm=True) > b1


def test_report_bound_classification():
    peak = roofline.PEAKS["tpu-v5e"]
    ridge = peak.matmul_f32_flops / peak.hbm_bytes
    # Intensity far above the ridge -> compute-bound.
    rep = roofline.report(flops=1e12, bytes_moved=1e12 / (10 * ridge), seconds=1.0, peak=peak)
    assert rep["bound"] == "compute"
    # Far below -> bandwidth-bound.
    rep = roofline.report(flops=1e9, bytes_moved=1e9, seconds=1.0, peak=peak)
    assert rep["bound"] == "bandwidth"
    # A kernel at exactly the roofline limit reports 100%.
    limit = rep["roofline_limit_seconds"]
    rep2 = roofline.report(flops=1e9, bytes_moved=1e9, seconds=limit, peak=peak)
    assert rep2["pct_of_roofline"] == pytest.approx(100.0)


def test_transformer_flops_monotone():
    base = roofline.transformer_flops(100, 128, 3, 256, 5, 4)
    assert roofline.transformer_flops(200, 128, 3, 256, 5, 4) > base
    assert roofline.transformer_flops(100, 256, 3, 256, 5, 4) > base
    assert roofline.transformer_flops(100, 128, 6, 256, 5, 4) > base
