"""True Structured Streaming session_window with watermark (O46/O66,
VERDICT r1 item 8): gap-merged sessions emitted in append mode must match
both the batch session_window aggregation and the batch gaps-and-islands
operator (operators.windows.session_bounds).

Gap values are 5 s / 50 s (never exactly the 30 s gap), so the strict-'>'
break of sessionize and session_window's half-open session end agree and
the two batch formulations are comparable 1:1.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.operators.windows import session_bounds

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)


def _agg(df):
    return (
        df.withWatermark("event_time", "10 seconds")
        .groupBy("doc_id", F.session_window("event_time", "30 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@pytest.mark.timeout(300)
def test_streaming_session_window_matches_batch(spark, tmp_path):
    base = pd.Timestamp("2024-01-01")
    rows = []
    for doc, phase in (("a", 0), ("b", 3)):
        t = 0.0
        for i in range(40):
            t += 5.0 if (i + phase) % 5 else 50.0
            rows.append((doc, base + pd.Timedelta(seconds=t)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "event_time"])
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(pdf, schema=SCHEMA).write.mode("overwrite").parquet(src)

    q = (
        _agg(spark.readStream.schema(SCHEMA).parquet(src))
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    streamed = spark.sql(
        "select doc_id, w.start as ws, w.end as we, n from sess"
    ).toPandas()

    batch_df = spark.createDataFrame(pdf, schema=SCHEMA)
    batch = (
        _agg(batch_df)
        .select("doc_id", F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n")
        .toPandas()
    )

    # append mode emits only sessions closed by the final watermark; every
    # emitted session must match the batch session_window result exactly
    assert len(streamed) > 0
    b = batch.set_index(["doc_id", "ws"])
    for r in streamed.itertuples(index=False):
        key = (r.doc_id, r.ws)
        assert key in b.index, key
        assert b.loc[key, "we"] == r.we
        assert b.loc[key, "n"] == r.n

    # cross-check: batch session_window == the gaps-and-islands operator
    # (session end = last event + gap)
    ev = batch_df.withColumn(
        "e", F.unix_micros("event_time") / F.lit(1000000.0)
    )
    islands = session_bounds(ev, "e", "doc_id", gap=30.0).toPandas()
    isl = {
        (r.doc_id, round(r.start_time, 6)): (round(r.end_time, 6), r.n_rows)
        for r in islands.itertuples(index=False)
    }
    assert len(islands) == len(batch)
    for r in batch.itertuples(index=False):
        ws = round(r.ws.timestamp(), 6)
        we = round(r.we.timestamp(), 6)
        end_time, n_rows = isl[(r.doc_id, ws)]
        assert abs((end_time + 30.0) - we) < 1e-6
        assert n_rows == r.n
