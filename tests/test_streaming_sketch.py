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


def test_streaming_hll_matches_batch(spark, tmp_path):
    from seizury_hrv_featuresextraction_spark.operators.sketches import (
        hll_estimate,
        hll_register_table,
    )
    from seizury_hrv_featuresextraction_spark.functions.text import (
        word_shingles_of,
        words,
    )
    from seizury_hrv_featuresextraction_spark.streaming.sketch_stream import (
        streaming_hll_registers,
    )
    from pyspark.sql import functions as F

    src = str(tmp_path / "hll_src")
    b1 = [(i, f"w{i % 5} common tail words here {i}") for i in range(40)]
    b2 = [(i + 100, f"w{i % 3} other tail words here {i}") for i in range(30)]
    spark.createDataFrame(b1, SCHEMA).withColumn(
        "source", F.concat(F.lit("s"), F.col("doc_id") % 2)
    ).write.parquet(src + "/f1")
    spark.createDataFrame(b2, SCHEMA).withColumn(
        "source", F.concat(F.lit("s"), F.col("doc_id") % 2)
    ).write.parquet(src + "/f2")

    # NB: StructType.add mutates in place — build a fresh schema
    sschema = T.StructType([*SCHEMA.fields, T.StructField("source", T.StringType())])
    stream_in = (
        spark.readStream.schema(sschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    regs = streaming_hll_registers(stream_in, "text", "source", shingle_words=3)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    # registers are monotone: current sketch = max per (g, reg)
    got = {
        (r.g, r.reg): r.rho
        for r in spark.sql(
            "select g, reg, max(rho) as rho from hll_regs group by g, reg"
        ).collect()
    }
    batch_df = spark.createDataFrame([*b1, *b2], SCHEMA).withColumn(
        "source", F.concat(F.lit("s"), F.col("doc_id") % 2)
    )
    occ = batch_df.select(
        F.col("source").alias("g"), words(F.col("text")).alias("__ws")
    ).select("g", F.explode(word_shingles_of(F.col("__ws"), 3)).alias("it"))
    want_regs = hll_register_table(occ, "it", "g")
    want = {(r.g, r.reg): r.rho for r in want_regs.collect()}
    assert got == want

    # estimate over the drained registers == the batch estimate
    drained = spark.createDataFrame(
        [(g, reg, rho) for (g, reg), rho in got.items()], "g string, reg int, rho int"
    )
    est_s = {r.g: r.est_distinct for r in hll_estimate(drained).collect()}
    est_b = {r.g: r.est_distinct for r in hll_estimate(want_regs).collect()}
    assert est_s == est_b
    assert q.recentProgress and len(q.recentProgress) >= 2


def test_streaming_hdr_histogram_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from seizury_hrv_featuresextraction_spark.streaming.sketch_stream import (
        streaming_hdr_histogram,
    )

    vschema = T.StructType(
        [
            T.StructField("g", T.StringType(), False),
            T.StructField("v", T.LongType(), False),
        ]
    )
    b1 = [("A", 10 + (i * 17) % 900) for i in range(300)]
    b2 = [("A", 2000 + (i * 7) % 8000) for i in range(200)] + [
        ("B", 50 + i) for i in range(100)
    ]
    src = str(tmp_path / "hdr_src")
    spark.createDataFrame(b1, vschema).write.parquet(src + "/f1")
    spark.createDataFrame(b2, vschema).write.parquet(src + "/f2")

    stream_in = (
        spark.readStream.schema(vschema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    hist = streaming_hdr_histogram(stream_in, "v", "g")
    q = (
        hist.writeStream.format("memory")
        .queryName("hdr_hist")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    # counts monotone -> current histogram = max per (g, b), and it
    # must equal the batch bucketing of the same rows exactly
    drained = spark.sql("select g, b, max(c) as c from hdr_hist group by g, b")
    batch_df = spark.createDataFrame([*b1, *b2], vschema)
    from seizury_hrv_featuresextraction_spark.operators.sketches import hdr_bucket

    want_hist = {
        (r.g, r.b): r.c
        for r in batch_df.select("g", hdr_bucket(F.col("v")).alias("b"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    got_hist = {(r.g, r.b): r.c for r in drained.collect()}
    assert got_hist == want_hist
    assert q.recentProgress and len(q.recentProgress) >= 2
