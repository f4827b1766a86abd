"""E63 streaming CMS: drained multi-trigger sketch == batch cms_build
on the same rows; state stays bounded at depth x width."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.operators.sketches import cms_build
from seizury_hrv_featuresextraction_spark.streaming.sketch_stream import (
    streaming_cms_cells,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

BATCH1 = [(0, "the cat sat on the mat the cat sat"), (1, "a dog ran fast a dog ran")]
BATCH2 = [(2, "the cat sat on the mat"), (3, None), (4, "a dog ran fast")]
DEPTH, WIDTH = 3, 32


def test_streaming_cms_matches_batch(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    # two separate files -> maxFilesPerTrigger=1 forces TWO triggers,
    # so the sketch is genuinely maintained incrementally
    spark.createDataFrame(BATCH1, SCHEMA).write.parquet(src + "/f1")
    spark.createDataFrame(BATCH2, SCHEMA).write.parquet(src + "/f2")

    stream_in = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    cells = streaming_cms_cells(stream_in, "text", n=3, depth=DEPTH, width=WIDTH)
    q = (
        cells.writeStream.format("memory")
        .queryName("cms_cells")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    # counts are monotone: current sketch = max per (r, b) over updates
    rows = spark.sql(
        "select r, b, max(c) as c from cms_cells group by r, b"
    ).collect()
    got = [0] * (DEPTH * WIDTH)
    for row in rows:
        got[row.r * WIDTH + row.b] = row.c
    assert len(rows) <= DEPTH * WIDTH  # bounded state

    batch_df = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    assert got == cms_build(batch_df, "text", n=3, depth=DEPTH, width=WIDTH)

    # and more than one trigger actually ran (incremental maintenance,
    # not a single batch in disguise)
    assert q.lastProgress is not None
    assert q.recentProgress and len(q.recentProgress) >= 2
