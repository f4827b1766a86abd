"""True-streaming flagship twin: token chunks over microbatches ->
stateful per-doc window assembly -> 23-feature rows, asserted
feature-for-feature (allclose) equal to the batch extract_features on
the concatenated documents once the stream drains.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.config import HRVConfig
from seizury_hrv_featuresextraction_spark.datagen import make_sequences
from seizury_hrv_featuresextraction_spark.functions.hrv import ALL_FEATURES
from seizury_hrv_featuresextraction_spark.plans.hrv_pipeline import extract_features
from seizury_hrv_featuresextraction_spark.streaming.hrv_stream import streaming_hrv_features

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
    ]
)

CFG = HRVConfig(n_freqs=64)  # smaller spectral grid: identical code path, faster test


def _chunked(seq_pdf: pd.DataFrame, n_chunks: int) -> pd.DataFrame:
    rows = []
    for _, r in seq_pdf.iterrows():
        toks = list(r["tokens"])
        size = max(1, len(toks) // n_chunks)
        for ci, lo in enumerate(range(0, len(toks), size)):
            rows.append((r["doc_id"], ci, toks[lo : lo + size]))
    return pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "tokens"])


@pytest.mark.timeout(300)
def test_streaming_hrv_matches_batch(spark, tmp_path):
    seq_pdf = make_sequences(6, short_range=(400, 900), long_range=(1200, 1600), long_frac=0.3)
    chunks = _chunked(seq_pdf, n_chunks=6)

    # split chunks into two IN-ORDER microbatch files (early chunk ids
    # first) with distinct mtimes so the file source replays them in order
    src = str(tmp_path / "tok_stream")
    early = chunks[chunks.chunk_idx < 3]
    late = chunks[chunks.chunk_idx >= 3]
    spark.createDataFrame(early, schema=CHUNK_SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(late, schema=CHUNK_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream_in = spark.readStream.schema(CHUNK_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_hrv_features(stream_in, CFG)
        .writeStream.format("memory")
        .queryName("hrv_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    streamed = (
        spark.sql("select * from hrv_stream")
        .toPandas()
        .sort_values(["doc_id", "window_id"])
        .reset_index(drop=True)
    )

    batch = (
        extract_features(spark.createDataFrame(seq_pdf), None, CFG)
        .select("doc_id", "window_id", "n_beats", *ALL_FEATURES)
        .toPandas()
        .sort_values(["doc_id", "window_id"])
        .reset_index(drop=True)
    )
    assert len(streamed) == len(batch) > 0
    assert streamed["doc_id"].tolist() == batch["doc_id"].tolist()
    assert streamed["window_id"].tolist() == batch["window_id"].tolist()
    assert streamed["n_beats"].tolist() == batch["n_beats"].tolist()
    for name in ALL_FEATURES:
        assert np.allclose(
            streamed[name].to_numpy(float),
            batch[name].to_numpy(float),
            rtol=1e-9,
            atol=1e-12,
            equal_nan=True,
        ), name
    # every window was emitted exactly once across microbatches
    assert not streamed.duplicated(["doc_id", "window_id"]).any()


def test_streaming_hrv_batch_path(spark):
    """The batch fallback of the same operator equals extract_features."""
    seq_pdf = make_sequences(3, short_range=(400, 800), long_range=(900, 1000), long_frac=0.0)
    chunks = _chunked(seq_pdf, n_chunks=4)
    got = (
        streaming_hrv_features(spark.createDataFrame(chunks, schema=CHUNK_SCHEMA), CFG)
        .toPandas()
        .sort_values(["doc_id", "window_id"])
        .reset_index(drop=True)
    )
    exp = (
        extract_features(spark.createDataFrame(seq_pdf), None, CFG)
        .select("doc_id", "window_id", "n_beats", *ALL_FEATURES)
        .toPandas()
        .sort_values(["doc_id", "window_id"])
        .reset_index(drop=True)
    )
    assert got["window_id"].tolist() == exp["window_id"].tolist()
    for name in ALL_FEATURES:
        assert np.allclose(
            got[name].to_numpy(float), exp[name].to_numpy(float),
            rtol=1e-9, atol=1e-12, equal_nan=True,
        ), name
