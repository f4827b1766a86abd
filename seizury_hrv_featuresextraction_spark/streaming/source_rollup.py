"""E44: streaming ingest accounting on the MODERN stateful API.

``transformWithState`` (Spark 4.x, SPARK-46815) is the successor to
``applyInPandasWithState``: typed per-key state variables (value / list
/ map), timers, TTL, and an OSS state-store-backed lifecycle. The rest
of the engine's stateful streaming (flagship HRV assembly, curation
quota) predates it on ``applyInPandasWithState``; this operator
exercises the new API so the engine covers both generations of the
stateful surface.

The operator is the standard ingest-accounting rollup a training-data
intake pipeline runs next to the firehose: per SOURCE, maintain running
(n_docs, n_tokens) totals across microbatches and emit the updated
totals once per microbatch in which the source saw traffic — a
change-log of per-source consumption (the thing a token-budget
dashboard tails). Emitted rows carry ``seq``, a per-source emission
counter, so downstream consumers can order the change-log without
event-time.

Scale: state is two counters per source (bounded by source cardinality,
not stream length); input shuffles once on the source key — the same
partitioning any per-source aggregate needs.

Batch twin for tests: ``groupBy(source).agg(count, sum)`` — after the
stream drains, the LAST emission per source must equal the batch
aggregate exactly.

ENVIRONMENTAL GATE: the transformWithState driver worker imports
``google.protobuf`` (state-server protocol), which this sandbox lacks
and cannot install. The processor's state logic is tested driver-free
in pure python; the end-to-end streaming test auto-enables the moment
protobuf is present (tests/test_streaming_tws.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), True),
        T.StructField("n_docs", T.LongType(), True),
        T.StructField("n_tokens", T.LongType(), True),
    ]
)


class SourceRollupProcessor(StatefulProcessor):
    """Per-source running (n_docs, n_tokens) via a typed ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        seq, n_docs, n_tokens = (
            self._totals.get() if self._totals.exists() else (0, 0, 0)
        )
        add_docs = 0
        add_tokens = 0
        for pdf in rows:
            add_docs += len(pdf)
            add_tokens += int(pdf["n_tok"].sum())
        seq, n_docs, n_tokens = int(seq) + 1, int(n_docs) + add_docs, int(n_tokens) + add_tokens
        self._totals.update((seq, n_docs, n_tokens))
        yield pd.DataFrame(
            {"source": [source], "seq": [seq], "n_docs": [n_docs], "n_tokens": [n_tokens]}
        )

    def close(self) -> None:
        pass


def streaming_source_rollup(docs: DataFrame) -> DataFrame:
    """(source, doc_id, n_tok) stream -> per-source running-total
    change-log rows. Streaming input only (the batch twin is a plain
    groupBy aggregate — see module docstring)."""
    return docs.groupBy("source").transformWithStateInPandas(
        statefulProcessor=SourceRollupProcessor(),
        outputStructType=ROLLUP_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def batch_source_rollup(docs: DataFrame) -> DataFrame:
    """The batch twin: final totals per source."""
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
