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
