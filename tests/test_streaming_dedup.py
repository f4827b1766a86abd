"""Streaming exact-dedup across microbatches: Spark's built-in
dropDuplicatesWithinWatermark keyed on the engine's content fingerprint
(functions/text.py doc_fingerprint) — the streaming twin of
operators/dedup.dedup_exact_keep. Duplicates arriving in LATER
microbatches (within the watermark) are dropped by state, not by an
in-batch shuffle."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.functions.text import doc_fingerprint

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


@pytest.mark.timeout(300)
def test_streaming_dedup_within_watermark(spark, tmp_path):
    base = datetime(2026, 1, 1)
    texts = [f"document body {i % 6}" for i in range(24)]  # 6 distinct texts
    pdf = pd.DataFrame(
        {
            "doc_id": range(24),
            "ts": [base + timedelta(seconds=i) for i in range(24)],
            "text": texts,
        }
    )
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(pdf.iloc[:12], schema=SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(pdf.iloc[12:], schema=SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream_in = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("fp", doc_fingerprint(F.col("text")))
        .withWatermark("ts", "10 minutes")
    )
    out = stream_in.dropDuplicatesWithinWatermark(["fp"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = spark.sql("select * from dedup_stream").toPandas()
    # exactly one survivor per distinct fingerprint, even though 18 of
    # the 24 duplicates arrived in a LATER microbatch than the original
    assert len(got) == 6
    assert got["fp"].is_unique
    assert sorted(got["text"].unique()) == sorted(set(texts))


@pytest.mark.timeout(300)
def test_streaming_dedup_against_reference_matches_batch(spark, tmp_path):
    """E47b streaming leg: a document stream anti-joined against the
    maintained reference table. The per-doc decision is stateless, so
    drained output must equal batch dedup_against_reference EXACTLY
    under any microbatch split — including the NULL-text and
    no-shingle edges (both survive the band stage, as in batch)."""
    from seizury_hrv_featuresextraction_spark.operators.dedup import (
        corpus_reference_keys,
        dedup_against_reference,
    )
    from seizury_hrv_featuresextraction_spark.streaming.curation_stream import (
        streaming_dedup_against_reference,
    )

    ref = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "spark catalyst optimizer rewrites logical plans fast"),
        ],
        "doc_id long, text string",
    )
    ref_keys = corpus_reference_keys(ref, "text", "doc_id").cache()
    ref_keys.count()

    new_rows = [
        (10, "The Quick  brown fox jumps over the lazy dog tonight"),  # exact (normalized)
        (11, "spark catalyst optimizer rewrites logical plans slowly"),  # near-dup (bands)
        (12, "completely novel content about entirely different things"),
        (13, None),                                                      # NULL text
        (14, "two words"),                                               # no 3-shingles
        (15, "the quick brown fox jumps over the lazy dog tonight"),     # exact
        (16, "novel again with plenty of fresh words to keep around"),
    ]
    crawl_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    new_df = spark.createDataFrame(new_rows, crawl_schema)
    expected = sorted(
        r["doc_id"]
        for r in dedup_against_reference(new_df, ref_keys, "text", "doc_id").collect()
    )
    assert expected == [12, 13, 14, 16]  # sanity: exact+near dropped, edges kept

    src = str(tmp_path / "crawl_src")
    spark.createDataFrame(new_rows[:3], crawl_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(new_rows[3:], crawl_schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream_in = spark.readStream.schema(crawl_schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_dedup_against_reference(stream_in, ref_keys, "text", "doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("ref_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(r["doc_id"] for r in spark.sql("select * from ref_dedup_stream").collect())
    assert got == expected


def test_streaming_fingerprint_overlap_matches_batch(spark, tmp_path):
    """E50c streaming leg: watermarked evidence pairs from a crawl
    stream vs the static winnowing-sketch table must equal the batch
    E50c computation per event window, under multi-trigger delivery,
    and the query must be genuinely stateful (watermarked streaming
    aggregation -> stateOperators present). A far-future sentinel doc
    in the trailing files advances the final watermark past every
    real window so append mode flushes them all (emission in batch N
    uses the watermark from batch N-1, hence two heartbeats)."""
    from datetime import datetime, timedelta

    from seizury_hrv_featuresextraction_spark.operators.dedup import (
        winnowing_fingerprints,
    )
    from seizury_hrv_featuresextraction_spark.streaming.curation_stream import (
        streaming_fingerprint_overlap,
    )

    lifted = "the quick brown fox jumps over the lazy dog tonight again"
    ref = spark.createDataFrame(
        [
            (1, f"corpus page one holds {lifted} inside much longer prose body"),
            (2, "spark catalyst optimizer rewrites logical plans very fast indeed when rules fire in order across the whole tree"),
        ],
        "doc_id long, text string",
    )
    ref_fps = winnowing_fingerprints(ref, "text", "doc_id").cache()
    ref_fps.count()

    t0 = datetime(2024, 1, 1)
    crawl_rows = [
        # window 0: lifts the corpus paragraph (hits ref doc 1)
        (10, f"fresh page but {lifted} was pasted wholesale", t0 + timedelta(seconds=5)),
        # window 0: near-copy of ref doc 2
        (11, "spark catalyst optimizer rewrites logical plans very fast indeed when rules fire in order across the whole tree", t0 + timedelta(seconds=20)),
        # window 1: novel content, no evidence
        (12, "entirely novel words with no overlap to anything stored before", t0 + timedelta(seconds=70)),
        # window 1: lifts the paragraph again, later window
        (13, f"another thief page {lifted} end of story", t0 + timedelta(seconds=95)),
        (14, None, t0 + timedelta(seconds=100)),  # NULL text
        (15, "two words", t0 + timedelta(seconds=110)),  # under k words
    ]
    # TWO trailing heartbeats: batch N emits windows closed by the
    # watermark computed through batch N-1, so the first heartbeat
    # advances the clock and the second triggers the flush
    sentinel = [(999, None, t0 + timedelta(hours=6))]
    sentinel2 = [(998, None, t0 + timedelta(hours=7))]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("event_time", T.TimestampType(), False),
        ]
    )
    src = str(tmp_path / "fp_crawl")
    spark.createDataFrame(crawl_rows[:2], schema).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(crawl_rows[2:], schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(sentinel, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(sentinel2, schema).coalesce(1).write.mode("append").parquet(src)

    # batch replication of the same windowed evidence
    crawl = spark.createDataFrame(crawl_rows, schema)
    new_fps = (
        winnowing_fingerprints(crawl, "text", "doc_id")
        .select(F.col("doc_id").alias("new_id"), "fp")
        .distinct()
        .join(crawl.select(F.col("doc_id").alias("new_id"), "event_time"), "new_id")
    )
    batch = (
        new_fps.join(
            ref_fps.select(F.col("doc_id").alias("ref_id"), "fp").distinct(), "fp"
        )
        .groupBy(
            F.window("event_time", "1 minute").alias("__w"), "new_id", "ref_id"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
        .select(F.col("__w.start").alias("window_start"), "new_id", "ref_id", "shared_fps")
    )
    expected = sorted(map(tuple, batch.collect()))
    exp_ids = sorted({(r[1], r[2]) for r in expected})
    assert exp_ids == [(10, 1), (11, 2), (13, 1)], exp_ids  # sanity

    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_fingerprint_overlap(
        stream_in, ref_fps, "text", "doc_id", "event_time", min_shared=2
    )
    q = (
        out.writeStream.format("memory")
        .queryName("fp_overlap_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    prog = q.lastProgress
    assert prog is not None and prog["stateOperators"], prog
    got = sorted(map(tuple, spark.sql("select * from fp_overlap_stream").collect()))
    assert got == expected
