"""Welch fallback path (hrv_features.py:174-195): cubic-interpolate RR
onto a uniform 4 Hz grid, Welch PSD, band powers. No scipy here, so the
check is internal consistency + known-signal behavior rather than a
scipy-parity gate (the Lomb-Scargle primary path carries the parity gate).
"""

from __future__ import annotations

import numpy as np

from seizury_hrv_featuresextraction_spark.config import HRVConfig
from seizury_hrv_featuresextraction_spark.functions.hrv import WindowKernel
from seizury_hrv_featuresextraction_spark.functions.spectral import cubic_interp, welch_psd


def test_cubic_interp_reproduces_knots_and_smooth():
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    y = np.sin(x)
    xq = np.linspace(0.2, 4.8, 50)
    got = cubic_interp(x, y, xq)
    assert np.allclose(cubic_interp(x, y, x), y, atol=1e-12)  # exact at knots
    # natural-spline boundary condition -> error concentrates at the ends
    assert np.max(np.abs(got - np.sin(xq))) < 0.08
    mid = (xq > 1.0) & (xq < 4.0)
    assert np.max(np.abs(got[mid] - np.sin(xq[mid]))) < 0.02


def test_welch_peak_detection():
    fs = 4.0
    t = np.arange(0, 120, 1 / fs)
    sig = 0.8 + 0.05 * np.sin(2 * np.pi * 0.1 * t)  # 0.1 Hz (LF band)
    freqs, psd = welch_psd(sig, fs, nperseg=min(256, sig.size // 2))
    peak = freqs[np.argmax(psd[1:]) + 1]
    assert abs(peak - 0.1) < 0.02


def test_welch_fallback_kernel_path():
    cfg = HRVConfig(use_welch_fallback=True)
    k = WindowKernel(cfg)
    rng = np.random.default_rng(42)
    rr = np.clip(0.8 + 0.1 * rng.standard_normal(40), 0.4, 1.5)
    t = np.cumsum(rr)
    v = k.feature_vector(rr, t)
    freq = v[9:17]
    assert np.isfinite(freq).all()
    assert freq[0] > 0  # total power
    assert 0 <= freq[4] <= 100 and 0 <= freq[6] <= 100  # normalized %

    # batched chunk path routes through the same fallback (window 0 spans
    # [0, 30 s] — compare against the masked slice, not the full series)
    ids, feats = k.windows_for_chunk(rr, t, 0, 1)
    mask = (t >= 0.0) & (t <= 30.0)
    v_win = k.feature_vector(rr[mask], t[mask])
    assert np.allclose(feats[0], v_win, rtol=1e-12, atol=0, equal_nan=True)
