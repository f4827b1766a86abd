"""Streaming curation: the E25/E27 per-document curation ops are pure
scan-stage expressions, so the SAME operator code runs unchanged inside a
readStream pipeline (stateless projection/filter — no watermark, no state
store). Asserts drained-stream output == batch output, including across
microbatch boundaries (maxFilesPerTrigger=1)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.operators.curation import (
    gopher_repetition_filter,
    redact_pii,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


@pytest.mark.timeout(300)
def test_streaming_gopher_filter_and_redact_equals_batch(spark, tmp_path):
    texts = []
    for i in range(30):
        if i % 5 == 0:
            texts.append(" ".join(["spam spam"] * 15))  # dropped: top_word_frac
        elif i % 7 == 0:
            texts.append("tiny doc")  # dropped: min_words
        else:
            texts.append(
                " ".join(f"w{i}x{j}" for j in range(25))
                + f" mail me at user{i}@host.example.net now"
            )
    pdf = pd.DataFrame({"doc_id": range(30), "text": texts})

    src = str(tmp_path / "cur_src")
    for lo, hi in ((0, 10), (10, 20), (20, 30)):  # three microbatches
        spark.createDataFrame(pdf.iloc[lo:hi], schema=SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def pipeline(df):
        return redact_pii(gopher_repetition_filter(df), "text").select(
            "doc_id", "n_email", "text_redacted"
        )

    stream_in = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out_dir = str(tmp_path / "cur_out")
    q = (
        pipeline(stream_in)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cur_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        pipeline(spark.createDataFrame(pdf, schema=SCHEMA))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    # the repetitive and too-short docs were dropped in both paths
    assert not set(got["doc_id"]) & {0, 5, 7, 10, 15, 20, 21, 25}
    # and every surviving doc's planted email got redacted
    assert got["text_redacted"].str.contains("<EMAIL>").all()
    assert (got["n_email"] == 1).all()


@pytest.mark.timeout(300)
def test_exactly_once_foreachbatch_sink(spark, tmp_path):
    """foreachBatch is at-least-once: a recovered query replays the last
    uncommitted microbatch with the SAME batch_id. The manifest-keyed
    sink must make that replay a no-op (exactly-once output), and must
    overwrite a half-written directory (no _SUCCESS / no manifest)."""
    import os

    from seizury_hrv_featuresextraction_spark.checkpoint import (
        exactly_once_batch_writer,
    )

    pdf = pd.DataFrame({"doc_id": range(30), "text": [f"body {i}" for i in range(30)]})
    src = str(tmp_path / "eo_src")
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        spark.createDataFrame(pdf.iloc[lo:hi], schema=SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = str(tmp_path / "eo_out")
    writer = exactly_once_batch_writer(out)
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "eo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = spark.read.parquet(out + "/batch=*")
    assert got.count() == 30
    n_batches = len([d for d in os.listdir(out) if d.startswith("batch=")])
    assert n_batches >= 2  # maxFilesPerTrigger=1 -> one batch per file

    # simulate the post-recovery replay of a committed batch: same id,
    # same data -> must be skipped (mtime of the manifest unchanged)
    mdir = os.path.join(out, "_manifest", "batch=0.json")
    before = os.path.getmtime(mdir)
    writer(spark.createDataFrame(pdf.iloc[:10], schema=SCHEMA), 0)
    assert os.path.getmtime(mdir) == before
    assert spark.read.parquet(out + "/batch=*").count() == 30

    # a half-written batch directory (crash before job commit: _SUCCESS
    # missing) must be rewritten, not trusted
    os.unlink(os.path.join(out, "batch=0", "_SUCCESS"))
    writer(spark.createDataFrame(pdf.iloc[:10], schema=SCHEMA), 0)
    assert "_SUCCESS" in os.listdir(os.path.join(out, "batch=0"))
    assert spark.read.parquet(out + "/batch=*").count() == 30


@pytest.mark.timeout(300)
def test_stream_static_decontamination(spark, tmp_path):
    """E28 in streaming form: a STATIC eval shingle set joined against a
    STREAM of incoming train docs (Spark's stream-static inner join is
    stateless — each microbatch hash-joins the broadcastable static side;
    the standard shape for filtering a live ingest against a frozen
    eval/blocklist set)."""
    from seizury_hrv_featuresextraction_spark.functions.text import words
    from seizury_hrv_featuresextraction_spark.operators.curation import token_shingles

    # static eval split: two docs that plant known 3-grams
    eval_df = spark.createDataFrame(
        [("e1", "alpha beta gamma delta"), ("e2", "one two three")],
        "doc_id string, text string",
    )
    eval_sh = eval_df.select(
        F.explode(token_shingles(words(F.col("text")), 3)).alias("sh")
    ).distinct()

    texts = {
        0: "alpha beta gamma nine",      # no full 3-gram overlap? alpha-beta-gamma IS one -> hit
        1: "nothing shared here at all",
        2: "zero one two three four",    # one-two-three -> hit
        3: "totally clean document text",
    }
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    src = str(tmp_path / "ss_src")
    for i in range(0, 4, 2):
        spark.createDataFrame(pdf.iloc[i : i + 2], schema=SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("doc_id", F.explode(token_shingles(words(F.col("text")), 3)).alias("sh"))
        .join(eval_sh, "sh")  # stream-static join: stateless, per microbatch
    )
    out = str(tmp_path / "ss_out")
    q = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        r["doc_id"]: r["n_overlap"]
        for r in spark.read.parquet(out)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .collect()
    }
    # doc 0 shares 'alpha-beta-gamma', doc 2 shares 'one-two-three';
    # docs 1 and 3 emit nothing (inner join drops them)
    assert got == {0: 1, 2: 1}, got


@pytest.mark.timeout(300)
def test_streaming_curation_pipeline_equals_batch(spark, tmp_path):
    """VERDICT r4 item 7 — E30's composed curation pipeline as ONE
    continuous streaming query (URL dedup -> Gopher filter -> content-fp
    dedup -> stateful per-source quota, three chained stateful
    operators): drained-stream survivors equal the batch
    curation_pipeline chain row-for-row.

    Streaming keyed stages are first-arrival (append mode cannot
    retract), so the test delivers microbatches in the batch plan's
    deterministic (md5(doc_id), doc_id) hash order — prefix batches of
    that order among survivors — and places every dup-group partner in a
    later batch than its keeper (within-microbatch dropDuplicates picks
    an arbitrary member; cross-batch state is deterministic)."""
    import hashlib

    from pyspark.sql import functions as F

    from seizury_hrv_featuresextraction_spark.operators.dedup import (
        dedup_exact_keep,
        derive_url,
        url_dedup_keep,
    )
    from seizury_hrv_featuresextraction_spark.operators.stats import cap_per_group
    from seizury_hrv_featuresextraction_spark.streaming.curation_stream import (
        streaming_curation_pipeline,
    )

    schema = "doc_id long, text string, source string"
    pool = [40 * i for i in range(1, 61)]  # one url bucket (i//40) each
    md5 = lambda i: hashlib.md5(str(i).encode()).hexdigest()
    order = sorted(pool, key=lambda i: (md5(i), i))
    b1, b2, b3 = order[:20], order[20:40], order[40:]
    src_of = {i: f"s{idx % 3}" for idx, i in enumerate(pool)}
    text_of = {i: " ".join(f"d{i}w{j}" for j in range(20)) for i in pool}
    rows = {1: [], 2: [], 3: []}
    for batch, ids in ((1, b1), (2, b2), (3, b3)):
        for i in ids:
            rows[batch].append((i, text_of[i], src_of[i]))
    for a in b1[:3]:  # url-dup partners (same source + i//40 bucket) arrive last
        rows[3].append((a + 1, " ".join(f"p{a}w{j}" for j in range(20)), src_of[a]))
    for c in b1[3:6]:  # content-dup partners (fresh url bucket, same text)
        rows[3].append((4000 + c, text_of[c], src_of[c]))
    for batch, i in ((1, 9001), (2, 9002), (3, 9003)):  # gopher-dropped
        rows[batch].append((i, "tiny doc", "s0"))

    src_dir = str(tmp_path / "curpipe_src")
    for b in (1, 2, 3):
        spark.createDataFrame(
            pd.DataFrame(rows[b], columns=["doc_id", "text", "source"]), schema=schema
        ).coalesce(1).write.mode("append").parquet(src_dir)

    stream_in = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        streaming_curation_pipeline(stream_in, k=6)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "curpipe_out"))
        .option("checkpointLocation", str(tmp_path / "curpipe_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = (
        spark.read.parquet(str(tmp_path / "curpipe_out"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    allrows = rows[1] + rows[2] + rows[3]
    bdf = spark.createDataFrame(
        pd.DataFrame(allrows, columns=["doc_id", "text", "source"]), schema=schema
    )
    e = dedup_exact_keep(gopher_repetition_filter(url_dedup_keep(derive_url(bdf)).drop("url")), "text", "doc_id")
    want = (
        cap_per_group(e, "doc_id", "source", k=6)
        .select("doc_id", "source", "domain", F.col("n_words").cast("long").alias("n_words"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(want) == 18  # quota binds: 3 sources x k=6
    pd.testing.assert_frame_equal(got, want)
    # the quota genuinely rejected survivors (not vacuous) and every
    # dup-group partner was dropped by state, never emitted
    assert not set(got["doc_id"]) & {a + 1 for a in b1[:3]}
    assert not set(got["doc_id"]) & {4000 + c for c in b1[3:6]}


@pytest.mark.timeout(300)
def test_streaming_rag_leg_equals_batch(spark, tmp_path):
    """r6: the RAG indexing leg (quality-score -> importance-sample ->
    chunk -> hash-embed) is pure scan-stage, so the SAME operator code
    runs unchanged in readStream (the classifier carries text through
    via extra_cols, so no stream-stream join appears); drained output
    == batch across microbatch boundaries."""
    import numpy as np

    from seizury_hrv_featuresextraction_spark.functions.vectors import hash_embed
    from seizury_hrv_featuresextraction_spark.operators.curation import (
        chunk_documents,
        hashed_linear_classifier,
        md5_feature_weights,
    )
    from seizury_hrv_featuresextraction_spark.operators.stats import importance_sample

    wts = md5_feature_weights(64)
    texts = [" ".join(f"w{i}x{j % 9}" for j in range(6 + (i * 3) % 20)) for i in range(24)]
    pdf = pd.DataFrame({"doc_id": range(24), "text": texts})
    src = str(tmp_path / "rag_src")
    for lo, hi in ((0, 8), (8, 16), (16, 24)):
        spark.createDataFrame(pdf.iloc[lo:hi], schema=SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def pipeline(df):
        scored = hashed_linear_classifier(df, wts, score_round=6, extra_cols=("text",))
        kept = importance_sample(scored, "doc_id", "prob", floor=0.3)
        chunks = chunk_documents(kept, "doc_id", "text", chunk_words=5, stride=3)
        return chunks.select(
            "doc_id", "chunk_id", hash_embed(F.col("chunk_text"), dim=8).alias("v")
        )

    batch = {
        (r["doc_id"], r["chunk_id"]): np.array(r["v"])
        for r in pipeline(spark.createDataFrame(pdf, schema=SCHEMA)).collect()
    }
    assert batch  # some docs survived the sampler

    stream_in = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        pipeline(stream_in)
        .writeStream.format("memory")
        .queryName("rag_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    streamed = {
        (r["doc_id"], r["chunk_id"]): np.array(r["v"])
        for r in spark.sql("select * from rag_stream").collect()
    }
    assert set(streamed) == set(batch)
    for k in batch:
        np.testing.assert_allclose(streamed[k], batch[k], atol=1e-12)
