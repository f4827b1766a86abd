"""True Structured Streaming run (O66-O69): parquet file source ->
applyInPandasWithState trailing buffer + debounce -> memory sink.

Verifies the streaming plan wires up (state schema, output mode,
event-time column) and that the streamed result matches the batch run of
the same state function on the same rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.streaming.stateful import streaming_feature_buffer

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("window_end_time", T.DoubleType(), False),
        T.StructField("f1", T.DoubleType(), True),
        T.StructField("f2", T.DoubleType(), True),
    ]
)


@pytest.mark.timeout(300)
def test_streaming_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(11)
    rows = []
    for doc in ["a", "b"]:
        for i in range(25):
            rows.append((doc, float(i * 5), float(rng.normal(0.5, 1)), float(rng.normal(0, 1))))
    pdf = pd.DataFrame(rows, columns=["doc_id", "window_end_time", "f1", "f2"])
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf, schema=SCHEMA).write.mode("overwrite").parquet(src)

    stream_in = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_feature_buffer(stream_in, ["f1", "f2"], seq_len=5, threshold=0.5, k_consecutive=2)
    q = (
        out.writeStream.format("memory")
        .queryName("preds")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    streamed = spark.sql("select * from preds").toPandas().sort_values(
        ["doc_id", "event_time"]
    ).reset_index(drop=True)

    batch_df = spark.createDataFrame(pdf, schema=SCHEMA)
    batch = (
        streaming_feature_buffer(batch_df, ["f1", "f2"], seq_len=5, threshold=0.5, k_consecutive=2)
        .toPandas()
        .sort_values(["doc_id", "event_time"])
        .reset_index(drop=True)
    )
    assert len(streamed) == len(batch) == len(pdf)
    assert streamed["buffer_size"].tolist() == batch["buffer_size"].tolist()
    assert streamed["alarm"].tolist() == batch["alarm"].tolist()
    s = streamed["score"].to_numpy(dtype=float)
    b = batch["score"].to_numpy(dtype=float)
    assert np.allclose(s, b, rtol=1e-12, atol=0, equal_nan=True)
