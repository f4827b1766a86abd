"""True-streaming debounce -> alarm-log sink (O69, VERDICT r2 item 8):
parquet file source -> applyInPandasWithState consecutive-positive
debounce with latching -> append sink holding ONE row per alarm
transition (the reference's alarm log file, stream_emulator.py:424-447).
Asserted equal to the batch window-function debounce on the same rows,
including multi-microbatch state carry-over.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.streaming.stateful import streaming_alarm_log

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("window_end_time", T.DoubleType(), False),
        T.StructField("positive", T.BooleanType(), False),
    ]
)


def _mk_rows():
    rng = np.random.default_rng(23)
    rows = []
    for doc in ["a", "b", "c", "d"]:
        for i in range(40):
            rows.append((doc, float(i * 5), bool(rng.random() > 0.45)))
    # doc 'e': never reaches 3 consecutive -> no alarm row at all
    for i in range(12):
        rows.append(("e", float(i * 5), i % 3 != 2))
    return pd.DataFrame(rows, columns=["doc_id", "window_end_time", "positive"])


@pytest.mark.timeout(300)
def test_streaming_alarm_log_matches_batch_debounce(spark, tmp_path):
    import time

    pdf = _mk_rows()
    src = str(tmp_path / "alarm_src")
    # two single-file microbatches SPLIT BY EVENT TIME with distinct
    # mtimes: the file source replays files in modification-time order,
    # so arrival order == event order (a real deployment would get the
    # same guarantee from its ingestion layer or a watermark + reorder)
    early, late = pdf[pdf.window_end_time < 100.0], pdf[pdf.window_end_time >= 100.0]
    spark.createDataFrame(early, schema=SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(late, schema=SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream_in = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_alarm_log(stream_in, "positive", k=3)
    q = (
        out.writeStream.format("memory")
        .queryName("alarm_log")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    streamed = (
        spark.sql("select * from alarm_log")
        .toPandas()
        .sort_values(["doc_id", "event_time"])
        .reset_index(drop=True)
    )

    batch = (
        streaming_alarm_log(spark.createDataFrame(pdf, schema=SCHEMA), "positive", k=3)
        .toPandas()
        .sort_values(["doc_id", "event_time"])
        .reset_index(drop=True)
    )
    # latch-once semantics: at most one alarm per doc, none for 'e'
    assert batch["doc_id"].is_unique and "e" not in set(batch["doc_id"])
    assert streamed["doc_id"].tolist() == batch["doc_id"].tolist()
    assert streamed["event_time"].tolist() == batch["event_time"].tolist()
    assert (streamed["n_consecutive"] == 3).all()
