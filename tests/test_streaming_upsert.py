"""E54b streaming latest-wins upsert: drained winners == batch
merge_upsert of the same crawl batches; emit-on-change semantics
(stale arrivals and identical replays emit nothing)."""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from seizury_hrv_featuresextraction_spark.operators.merge import merge_upsert
from seizury_hrv_featuresextraction_spark.streaming.upsert_stream import (
    UPSERT_OUT_SCHEMA,
    streaming_upsert,
)

IN_SCHEMA = "doc_id long, version long, payload string"

# batch 1 = the current corpus; batch 2 = the update crawl
B1 = [(1, 0, "a"), (2, 3, "b-newer"), (3, 0, "c")]
B2 = [
    (1, 2, "a-rev2"),   # update
    (2, 2, "b-stale"),  # stale -> no emission
    (3, 0, "c"),        # identical replay -> no emission
    (9, 2, "fresh"),    # insert
]


@pytest.mark.timeout(300)
def test_streaming_upsert_matches_batch_merge(spark, tmp_path):
    src = str(tmp_path / "upsert_src")
    spark.createDataFrame(B1, IN_SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(B2, IN_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream_in = (
        spark.readStream.schema(IN_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_upsert(stream_in)
        .writeStream.format("memory")
        .queryName("upsert_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    emitted = spark.sql("select * from upsert_stream").toPandas()

    # final image = max-seq row per key
    final = (
        emitted.sort_values(["doc_id", "seq"]).groupby("doc_id").tail(1)
        .set_index("doc_id")
    )
    batch = {
        r.doc_id: (r.version, r.payload)
        for r in merge_upsert(
            spark.createDataFrame(B1, IN_SCHEMA),
            spark.createDataFrame(B2, IN_SCHEMA),
        ).withColumnRenamed("payload", "payload").collect()
    }
    assert {
        d: (int(row.version), row.payload) for d, row in final.iterrows()
    } == batch

    # emit-on-change: key 2's stale arrival and key 3's identical replay
    # emitted exactly once (their batch-1 insert), nothing from batch 2
    per_key = emitted.groupby("doc_id").size().to_dict()
    assert per_key == {1: 2, 2: 1, 3: 1, 9: 1}
    acts = emitted.set_index(["doc_id", "seq"])["action"].to_dict()
    assert acts[(1, 1)] == "insert" and acts[(1, 2)] == "update"
    assert acts[(9, 1)] == "insert"
