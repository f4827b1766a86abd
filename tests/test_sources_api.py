"""Direct coverage for the thin API surfaces that other tests only hit
indirectly: the O2 TSV annotation scan, the O10 physiological bounds
filter, and the scalar text/vector function builders (O57-O65 family)."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from seizury_hrv_featuresextraction_spark.functions.text import (
    bpeish_token_count,
    char_shingles,
    token_count,
)
from seizury_hrv_featuresextraction_spark.functions.vectors import l2_distance
from seizury_hrv_featuresextraction_spark.operators.filters import physiological_filter
from seizury_hrv_featuresextraction_spark.sources.registry import read_annotations_tsv


def test_read_annotations_tsv(spark, tmp_path):
    tsv = tmp_path / "events.tsv"
    tsv.write_text(
        "doc_id\tonset\tduration\tevent_type\n"
        "d1\t10.5\t30.0\tsz\n"
        "d1\t100.0\t5.0\tbckg\n"
        "d2\t7.25\t12.5\tfnsz\n"
        "d2\t50.0\t1.0\tartifact\n"
    )
    all_rows = read_annotations_tsv(spark, str(tsv), seizures_only=False)
    assert all_rows.count() == 4
    assert dict(all_rows.dtypes)["onset"] == "double"

    sz = read_annotations_tsv(spark, str(tsv)).orderBy("doc_id").collect()
    # 'sz' (raw equality) and 'fnsz' (ILAE code) survive; bckg/artifact dropped
    assert [(r["doc_id"], r["onset"]) for r in sz] == [("d1", 10.5), ("d2", 7.25)]


def test_physiological_filter_bounds(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"rr": [0.1, 0.2, 0.8, 2.0, 2.5, float("nan")]})
    )
    got = sorted(r["rr"] for r in physiological_filter(df, "rr").collect())
    # inclusive bounds, NaN comparisons are false -> dropped
    assert got == [0.2, 0.8, 2.0]


def test_scalar_text_and_vector_builders(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["Hello big-world  ", "a,b,c 42x"]})
    )
    out = df.select(
        token_count(F.col("text")).alias("tc"),
        bpeish_token_count(F.col("text")).alias("bc"),
        char_shingles(F.col("text"), 4).alias("cs"),
    ).collect()
    assert out[0]["tc"] == 2
    # BPE-ish regex splits words, numbers and punctuation runs apart
    assert out[1]["bc"] >= 6
    # distinct lowercase char 4-grams of 'hello big-world  ' start at 'hell'
    assert "hell" in out[0]["cs"] and len(out[0]["cs"]) == len(set(out[0]["cs"]))

    vec = spark.createDataFrame([([3.0, 0.0], [0.0, 4.0])], "a array<double>, b array<double>")
    d = vec.select(l2_distance(F.col("a"), F.col("b")).alias("d")).first()["d"]
    assert math.isclose(d, 5.0, rel_tol=1e-12)
