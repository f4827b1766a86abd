"""ECG front-end tests, mirroring the reference's self-test fixture
(ecg_processing.py:373-408: 60 s @ 256 Hz, 75 bpm, stencil R-waves
[0.1,0.5,1.0,0.5,0.1], gaussian noise, seed 42)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.functions.ecg import (
    butter_bandpass,
    compute_rr_intervals,
    detect_r_peaks,
    filter_artifacts,
    filtfilt,
)
from seizury_hrv_featuresextraction_spark.plans.ecg_pipeline import signals_to_sequences
from seizury_hrv_featuresextraction_spark.plans.hrv_pipeline import extract_features
from seizury_hrv_featuresextraction_spark.config import HRVConfig


def synth_ecg(noise=0.05, dur=60, fs=256, hr=75, seed=42):
    rng = np.random.RandomState(seed)
    n = fs * dur
    ecg = noise * rng.randn(n)
    beat = int(fs * 60 / hr)
    true_peaks = list(range(10, n - 10, beat))
    stencil = np.array([0.1, 0.5, 1.0, 0.5, 0.1])
    for s in true_peaks:
        ecg[s - 2 : s + 3] += stencil
    return ecg, np.array(true_peaks)


def test_bandpass_frequency_response():
    b, a = butter_bandpass(4, 0.5 / 128, 40 / 128)

    def mag(f, fs=256):
        z = np.exp(1j * 2 * np.pi * f / fs)
        return abs(np.polyval(b, z) / np.polyval(a, z))

    assert mag(10) > 0.99                 # passband flat
    assert abs(mag(40) - 1 / np.sqrt(2)) < 0.01   # -3 dB at the edge
    assert mag(0.05) < 0.01 and mag(100) < 0.01   # stopbands
    assert np.all(np.abs(np.roots(a)) < 1)        # stable


def test_filtfilt_zero_phase():
    b, a = butter_bandpass(4, 0.5 / 128, 40 / 128)
    t = np.arange(0, 30, 1 / 256.0)
    sig = np.sin(2 * np.pi * 10 * t)  # passband tone
    out = filtfilt(b, a, sig)
    mid = slice(2000, -2000)
    # zero phase: no lag; unit gain in passband
    assert np.corrcoef(out[mid], sig[mid])[0, 1] > 0.9999
    assert abs(out[mid].std() / sig[mid].std() - 1) < 0.01


def test_rpeak_recall_reference_fixture():
    """>90% R-peak accuracy claim (CHANGELOG.md:301) on the reference's
    own synthetic recipe."""
    ecg, true_peaks = synth_ecg()
    peaks = detect_r_peaks(ecg, 256)
    hits = sum(1 for p in peaks if np.min(np.abs(true_peaks - p)) <= 3)
    assert hits / len(true_peaks) > 0.9
    # distance constraint honored (0.3 s @ 256 Hz)
    assert np.diff(peaks).min() >= int(0.3 * 256)
    rr, rr_t = compute_rr_intervals(peaks, 256)
    clean, _, _ = filter_artifacts(rr, rr_t, "threshold")
    # physiological RRs near 0.8 s dominate after cleaning
    assert 0.3 < np.median(clean) < 1.2


def test_artifact_methods():
    rr = np.array([0.8, 0.81, 0.79, 3.5, 0.8, 0.05, 0.82])
    t = np.cumsum(rr)
    for method in ("threshold", "median", "iqr"):
        clean, ct, mask = filter_artifacts(rr, t, method)
        assert 3.5 not in clean and 0.05 not in clean, method
        assert len(clean) == len(ct)


SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("signal", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("sampling_rate", T.IntegerType(), False),
    ]
)


def test_spark_signals_to_features(spark):
    """End-to-end: raw signals -> sequences (input_hint) -> features."""
    rows = []
    for i, hr in enumerate([75, 62]):
        ecg, _ = synth_ecg(dur=120, hr=hr, seed=42 + i)
        rows.append((f"sub-{900+i:03d}_ses-01_run-01", [float(x) for x in ecg], 256))
    sig_df = spark.createDataFrame(rows, schema=SIG_SCHEMA)
    seq = signals_to_sequences(sig_df)
    seq_pdf = seq.toPandas()
    assert (seq_pdf["n_tok"] > 50).all()
    feats = extract_features(seq, None, HRVConfig(max_windows_per_chunk=64)).toPandas()
    assert len(feats) > 0
    ok = feats[feats["n_beats"] >= 5]
    assert len(ok) > 0 and np.isfinite(ok["SDNN"]).all()


def test_interpolate_artifacts():
    from seizury_hrv_featuresextraction_spark.functions.ecg import interpolate_artifacts

    rr = np.array([0.8, 0.8, 5.0, 0.9, 0.9])
    t = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    mask = np.array([False, False, True, False, False])
    out, ot = interpolate_artifacts(rr, t, mask)
    assert len(out) == 5 and abs(out[2] - 0.85) < 1e-12  # midpoint of 0.8 and 0.9
    assert (ot == t).all()


def test_patient_level_splits(spark):
    from seizury_hrv_featuresextraction_spark.operators.stats import patient_level_splits
    import pandas as pd

    pdf = pd.DataFrame({"subject_id": [f"s{i:02d}" for i in range(20) for _ in range(5)], "v": 1.0})
    out = patient_level_splits(spark.createDataFrame(pdf), test_frac=0.2, val_frac=0.1).toPandas()
    per_subject = out.groupby("subject_id")["split"].nunique()
    assert (per_subject == 1).all()  # no subject straddles splits
    counts = out.drop_duplicates("subject_id")["split"].value_counts()
    assert counts["test"] == 4 and counts["val"] == 2 and counts["train"] == 14
    # deterministic across invocations
    out2 = patient_level_splits(spark.createDataFrame(pdf), test_frac=0.2, val_frac=0.1).toPandas()
    m1 = out.drop_duplicates("subject_id").set_index("subject_id")["split"]
    m2 = out2.drop_duplicates("subject_id").set_index("subject_id")["split"]
    assert (m1.sort_index() == m2.sort_index()).all()
