"""True Structured Streaming windowed aggregation with a watermark
(O66/O67): event-time = window end, late rows beyond the watermark are
dropped, results match the batch computation of the same aggregation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


@pytest.mark.timeout(300)
def test_watermarked_window_agg_matches_batch(spark, tmp_path):
    rows = []
    for doc in ["a", "b"]:
        for i in range(60):
            rows.append((doc, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=5 * i), float(i % 7)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "event_time", "score"])
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf, schema=SCHEMA).write.mode("overwrite").parquet(src)

    def agg(df):
        return (
            df.withWatermark("event_time", "30 seconds")
            .groupBy("doc_id", F.window("event_time", "30 seconds", "10 seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"), F.avg("score").alias("avg_score"))
        )

    q = (
        agg(spark.readStream.schema(SCHEMA).parquet(src))
        .writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    streamed = spark.sql("select doc_id, w.start as ws, n, avg_score from winagg").toPandas()

    batch = (
        agg(spark.createDataFrame(pdf, schema=SCHEMA))
        .select("doc_id", F.col("w.start").alias("ws"), "n", "avg_score")
        .toPandas()
    )
    # append mode emits only windows closed by the final watermark; every
    # emitted window must match the batch result exactly
    assert len(streamed) > 0
    b = batch.set_index(["doc_id", "ws"])
    for r in streamed.itertuples(index=False):
        key = (r.doc_id, r.ws)
        assert key in b.index
        assert b.loc[key, "n"] == r.n
        assert abs(b.loc[key, "avg_score"] - r.avg_score) < 1e-12
