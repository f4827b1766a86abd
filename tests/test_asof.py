from __future__ import annotations

import pandas as pd
import pytest

from seizury_hrv_featuresextraction_spark.operators.asof import asof_join, asof_join_pandas


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b", "b", "c"],
                "ts": [1.0, 5.0, 9.0, 2.0, 3.0, 4.0],
                "lv": [10, 20, 30, 40, 50, 60],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b", "b"],
                "ts": [0.5, 5.0, 2.5, 7.0],
                "rv": [100.0, 200.0, 300.0, 400.0],
            }
        )
    )
    return left, right


def expected_merge_asof(left, right, direction):
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    return (
        pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_native_asof_matches_merge_asof(spark, sides, direction):
    left, right = sides
    got = (
        asof_join(left, right, on="ts", by="k", value_cols=["rv"], direction=direction)
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    exp = expected_merge_asof(left, right, direction)
    pd.testing.assert_series_equal(got["rv"], exp["rv"], check_names=False)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_pandas_asof_matches(spark, sides, direction):
    left, right = sides
    got = (
        asof_join_pandas(left, right, on="ts", by="k", value_cols=["rv"], direction=direction)
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    exp = expected_merge_asof(left, right, direction)
    pd.testing.assert_series_equal(got["rv"], exp["rv"], check_names=False)


def test_exact_match_inclusive(spark, sides):
    """right.ts == left.ts must match in both directions."""
    left, right = sides
    back = asof_join(left, right, on="ts", by="k", value_cols=["rv"], direction="backward").toPandas()
    row = back[(back["k"] == "a") & (back["ts"] == 5.0)]
    assert row["rv"].iloc[0] == 200.0
    fwd = asof_join(left, right, on="ts", by="k", value_cols=["rv"], direction="forward").toPandas()
    row = fwd[(fwd["k"] == "a") & (fwd["ts"] == 5.0)]
    assert row["rv"].iloc[0] == 200.0


def test_unmatched_is_null(spark, sides):
    left, right = sides
    back = asof_join(left, right, on="ts", by="k", value_cols=["rv"], direction="backward").toPandas()
    assert back[back["k"] == "c"]["rv"].isna().all()
