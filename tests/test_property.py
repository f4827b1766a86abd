"""Property-based tests (hypothesis): operator semantics vs pandas/NumPy
references on randomized inputs — the robustness layer SURVEY.md §5 notes
the reference lacks entirely.

One shared Spark session; small deadline-free profiles because each
example round-trips through the JVM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seizury_hrv_featuresextraction_spark.operators.asof import asof_join
from seizury_hrv_featuresextraction_spark.operators.windows import sessionize
from seizury_hrv_featuresextraction_spark.functions.hrv import WindowKernel, ALL_FEATURES
from seizury_hrv_featuresextraction_spark.oracle import oracle_feature_row
from seizury_hrv_featuresextraction_spark.config import DEFAULT_CONFIG

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

ts_lists = st.lists(
    st.floats(min_value=0.0, max_value=1e4, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=40,
)


@given(left_ts=ts_lists, right_ts=ts_lists)
@SETTINGS
def test_asof_backward_matches_merge_asof(spark, left_ts, right_ts):
    left = pd.DataFrame({"k": "a", "ts": sorted(set(left_ts))})
    right = pd.DataFrame({"k": "a", "ts": sorted(set(right_ts))})
    right["rv"] = np.arange(len(right), dtype=float)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts", by="k", value_cols=["rv"], direction="backward",
        )
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(left.sort_values("ts"), right[["ts", "rv"]].sort_values("ts"), on="ts").reset_index(drop=True)
    pd.testing.assert_series_equal(got["rv"], exp["rv"], check_names=False)


@given(
    ts=st.lists(
        st.floats(min_value=0.0, max_value=1e4, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=50,
    ),
    gap=st.floats(min_value=0.5, max_value=500.0),
)
@SETTINGS
def test_sessionize_matches_pandas(spark, ts, gap):
    pdf = pd.DataFrame({"k": "x", "ts": sorted(set(ts))})
    got = (
        sessionize(spark.createDataFrame(pdf), "ts", "k", gap=gap)
        .toPandas()
        .sort_values("ts")["session_id"]
        .to_numpy()
    )
    t = pdf["ts"].to_numpy()
    exp = np.concatenate([[0], np.cumsum(np.diff(t) > gap)])
    assert (got == exp).all()


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n=st.integers(min_value=5, max_value=60),
)
@SETTINGS
def test_kernel_matches_oracle_on_random_series(seed, n):
    rng = np.random.default_rng(seed)
    rr = np.clip(0.8 + 0.25 * rng.standard_normal(n), 0.2, 2.0)
    t = np.cumsum(rr)
    kern = WindowKernel(DEFAULT_CONFIG)
    got = kern.feature_vector(rr, t)
    exp = np.array([oracle_feature_row(rr, t, DEFAULT_CONFIG)[f] for f in ALL_FEATURES])
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12, equal_nan=True)
