"""E44: transformWithState (Spark 4 modern stateful API) — per-source
running ingest totals across microbatches; the LAST emission per source
after drain equals the batch aggregate, emissions are monotone, and seq
counts the microbatches in which each source saw traffic.

ENVIRONMENTAL GATE: transformWithState's driver worker imports
google.protobuf (pyspark/sql/streaming/proto/StateMessage_pb2), which
is not installed in this sandbox and cannot be (no pip). The streaming
test skips when protobuf is absent; the batch twin and the processor's
pure-python state logic are exercised unconditionally below."""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.streaming.source_rollup import (
    batch_source_rollup,
    streaming_source_rollup,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_tok", T.LongType(), False),
    ]
)


def _has_protobuf() -> bool:
    try:
        import google.protobuf.descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def test_source_rollup_processor_logic_pure_python():
    """The processor's state transitions, driven directly (no Spark
    streaming runtime needed): totals accumulate across calls, seq
    increments once per invocation, state round-trips."""
    from seizury_hrv_featuresextraction_spark.streaming.source_rollup import (
        SourceRollupProcessor,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema):
            return self.state

    proc = SourceRollupProcessor()
    h = FakeHandle()
    proc.init(h)
    out1 = list(proc.handleInputRows(("web",), iter([pd.DataFrame({"n_tok": [10, 20]})]), None))
    assert out1[0].iloc[0].tolist() == ["web", 1, 2, 30]
    out2 = list(proc.handleInputRows(("web",), iter([pd.DataFrame({"n_tok": [5]})]), None))
    assert out2[0].iloc[0].tolist() == ["web", 2, 3, 35]
    assert h.state.get() == (2, 3, 35)


@pytest.mark.skipif(not _has_protobuf(), reason="transformWithState driver worker needs google.protobuf (absent in sandbox, no pip)")
@pytest.mark.timeout(300)
def test_streaming_source_rollup_matches_batch(spark, tmp_path):
    rows = [("web", i, 100 + i) for i in range(20)] + [("books", 100 + i, 500 + i) for i in range(5)]
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "n_tok"])
    b1, b2 = pdf.iloc[:10], pdf.iloc[10:]

    src = str(tmp_path / "docs_stream")
    spark.createDataFrame(b1, schema=DOC_SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, schema=DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream_in = spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_source_rollup(stream_in)
        .writeStream.format("memory")
        .queryName("src_rollup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    out = spark.sql("select * from src_rollup").toPandas()

    # monotone change-log per source
    for s, grp in out.groupby("source"):
        grp = grp.sort_values("seq")
        assert list(grp["seq"]) == list(range(1, len(grp) + 1))
        assert grp["n_docs"].is_monotonic_increasing and grp["n_tokens"].is_monotonic_increasing

    last = (
        out.sort_values("seq").groupby("source").last().reset_index()[["source", "n_docs", "n_tokens"]]
    )
    batch = (
        batch_source_rollup(spark.createDataFrame(pdf, schema=DOC_SCHEMA))
        .toPandas()[["source", "n_docs", "n_tokens"]]
    )
    pd.testing.assert_frame_equal(
        last.sort_values("source").reset_index(drop=True),
        batch.sort_values("source").reset_index(drop=True),
        check_dtype=False,
    )
    # 'web' appears in both microbatches, 'books' in at least one
    web = out[out["source"] == "web"]
    assert web["seq"].max() == 2
