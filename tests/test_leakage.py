"""Zero-temporal-leakage gate (SURVEY.md §5.3).

Shift every annotation later by delta: no feature changes at all (labels
join is side-effect-free on features), and no label changes for window
centers earlier than (onset - sph - width/2) of the ORIGINAL events —
i.e. information never flows backward past the SPH horizon.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from seizury_hrv_featuresextraction_spark.functions.hrv import ALL_FEATURES
from seizury_hrv_featuresextraction_spark.schemas import ANNOTATIONS_SCHEMA, SEQUENCES_SCHEMA
from seizury_hrv_featuresextraction_spark.plans.hrv_pipeline import extract_features


def _run(spark, seq, ann, cfg):
    sdf = spark.createDataFrame(seq, schema=SEQUENCES_SCHEMA)
    adf = spark.createDataFrame(ann, schema=ANNOTATIONS_SCHEMA)
    return (
        extract_features(sdf, adf, cfg)
        .toPandas()
        .sort_values(["doc_id", "window_id"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_shifting_annotations_never_leaks_backward(spark, fixture_tables, tiny_cfg):
    seq, ann = fixture_tables
    seq = seq.iloc[:5]
    ann = ann[ann["doc_id"].isin(seq["doc_id"])].reset_index(drop=True)
    assert len(ann) > 0
    delta = 40.0
    shifted = ann.copy()
    shifted["onset"] = shifted["onset"] + delta

    base = _run(spark, seq, ann, tiny_cfg)
    moved = _run(spark, seq, shifted, tiny_cfg)

    # 1) features are label-independent
    for c in ALL_FEATURES:
        assert np.allclose(
            base[c].to_numpy(), moved[c].to_numpy(), rtol=0, atol=0, equal_nan=True
        ), f"feature {c} changed when only labels moved"

    # 2) labels before the original horizon are untouched
    horizon = {}
    for doc, g in ann.groupby("doc_id"):
        horizon[doc] = g["onset"].min() - tiny_cfg.sph_seconds - tiny_cfg.label_width_seconds / 2.0
    early = base["window_center_time"] < base["doc_id"].map(horizon).fillna(np.inf)
    assert (base.loc[early, "label"].to_numpy() == moved.loc[early, "label"].to_numpy()).all()
    # sanity: the shift did change something somewhere
    assert (base["label"].to_numpy() != moved["label"].to_numpy()).any()
