"""Streaming multimodal ingest: the Arrow binary decode kernels are
stateless, so they run unchanged inside a Structured Streaming query —
drained per-clip PCM16 stats over a file stream equal the batch decode
of the same payloads (exact integers, so plain frame equality)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from seizury_hrv_featuresextraction_spark.operators.multimodal import pcm16_features

SCHEMA = "media_id string, payload binary"


@pytest.mark.timeout(300)
def test_streaming_pcm_decode_equals_batch(spark, tmp_path):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(30):
        x = rng.integers(-32768, 32767, size=rng.integers(1, 50), dtype=np.int64)
        rows.append((f"clip{i:02d}", bytearray(x.astype("<i2").tobytes())))
    rows.append(("empty", bytearray(b"")))       # dropped by the decoder
    rows.append(("halfsample", bytearray(b"\x01")))  # sub-sample payload, dropped

    src = str(tmp_path / "media_src")
    for lo, hi in ((0, 11), (11, 22), (22, 32)):  # three microbatches
        spark.createDataFrame(rows[lo:hi], SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream_in = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        pcm16_features(stream_in)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "media_out"))
        .option("checkpointLocation", str(tmp_path / "media_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = (
        spark.read.parquet(str(tmp_path / "media_out"))
        .toPandas().sort_values("media_id").reset_index(drop=True)
    )
    want = (
        pcm16_features(spark.createDataFrame(rows, SCHEMA))
        .toPandas().sort_values("media_id").reset_index(drop=True)
    )
    assert len(want) == 30  # the two degenerate payloads dropped in both paths
    pd.testing.assert_frame_equal(got, want)
