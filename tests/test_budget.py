"""eval/budget.py — shape-derived HBM budgeting units (round 5).

The compile-time memory gate itself needs a TPU (tools/probe_envelope.py
exercises it); these tests pin the analytic layers: the pre-filter model,
the env overrides, and the cap scaling that rides the Mosaic VMEM limit.
"""
import os

import pytest

from shiftnet_tpu.eval import budget


def test_hbm_budget_env_override(monkeypatch):
    monkeypatch.setenv('SHIFTNET_HBM_BYTES', '123456789')
    assert budget.hbm_budget() == 123456789
    monkeypatch.delenv('SHIFTNET_HBM_BYTES')
    assert budget.hbm_budget() == budget.DEFAULT_HBM_BUDGET
    # the default admits the verified-running program (16.73e9) and stays
    # under the v5e's 17.18e9 hardware bytes
    assert 16_730_000_000 <= budget.DEFAULT_HBM_BUDGET < 17_180_000_000


def test_px_prefilter_model():
    # fused bf16 at the deblur_plus widths: the measured ~447 B/px point
    # (16.48e9 B / 36.86M px) must sit within ~20% of the model's cap
    cap = budget.px_prefilter(24, 80, f32=False, fused=True)
    measured = budget.hbm_budget() / 447.0
    assert 0.8 * measured < cap < 1.2 * measured
    # f32 halves the pixel cap; smaller widths raise it
    assert budget.px_prefilter(24, 80, f32=True, fused=True) < cap
    assert budget.px_prefilter(14, 64, f32=False, fused=True) > cap
    # unfused path: the lane-padded NHWC constants
    assert budget.px_prefilter(24, 80, f32=False, fused=False) == 22_000_000
    assert budget.px_prefilter(24, 80, f32=True, fused=False) == 11_000_000


def test_cap_scale_tracks_vmem_limit(monkeypatch):
    from shiftnet_tpu.ops import chw
    monkeypatch.setenv('SHIFTNET_VMEM_LIMIT_MB', '0')
    assert chw.cap_scale() == 1.0          # limit off -> calibrated caps
    assert chw.mosaic_params() is None
    monkeypatch.setenv('SHIFTNET_VMEM_LIMIT_MB', '100')
    assert chw.cap_scale() == 4.0          # clamped at 4x
    mp = chw.mosaic_params()
    assert mp is not None and mp.vmem_limit_bytes == 100 * 1024 * 1024
    monkeypatch.setenv('SHIFTNET_VMEM_LIMIT_MB', '50')
    assert chw.cap_scale() == 2.0
