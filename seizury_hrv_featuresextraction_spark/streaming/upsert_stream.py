"""Streaming latest-wins upsert (E54b) — the Structured Streaming form
of ``operators/merge.merge_upsert``: crawl batches arrive as
microbatches, per-key state holds the current winner, and a row is
emitted ONLY when the winner changes (emit-on-change), tagged with the
MERGE action. Drained winners equal the batch merge of the same
batches (pytest-pinned).

Semantics (aligned with the batch operator's tie rule):
- higher version wins; an arriving row at the SAME version as the
  held state also wins (batch-beats-state == the batch side's
  ``is_new`` tiebreak), but an identical (version, payload) replay
  emits nothing — replay idempotency.
- first sight of a key emits ``insert``; a winner change afterwards
  emits ``update``; a losing (stale) arrival emits nothing — the
  batch operator's ``carry``.

State per key is ONE row (version, payload hash, emit seq) — bounded
regardless of stream length; `seq` is a per-key monotone counter so a
downstream consumer (or the test) can pick each key's LAST emission
from an append-mode sink without event-time bookkeeping.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

UPSERT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("action", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

UPSERT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType(), True),
        T.StructField("payload", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def _upsert_fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    doc_id = key[0]
    held = state.get if state.exists else (None, None, 0)
    version, payload, seq = held
    out = []
    for pdf in pdf_iter:
        # fold the microbatch in (version, arrival-order) — the batch
        # twin's max_by((version, is_new)) with arrival as the tiebreak
        for row in pdf.sort_values("version", kind="stable").itertuples():
            v, p = int(row.version), row.payload
            if version is None:
                version, payload, seq = v, p, seq + 1
                out.append((doc_id, v, p, "insert", seq))
            elif v > version or (v == version and p != payload):
                version, payload, seq = v, p, seq + 1
                out.append((doc_id, v, p, "update", seq))
            # else: stale or identical replay — carry, no emission
    state.update((version, payload, seq))
    if out:
        yield pd.DataFrame(
            out, columns=["doc_id", "version", "payload", "action", "seq"]
        )


def streaming_upsert(stream_df: DataFrame) -> DataFrame:
    """Apply latest-wins upsert state to a stream of
    (doc_id long, version long, payload string) rows. Returns the
    emit-on-change stream; pair with an append-mode sink and reduce to
    max-seq-per-key for the current table image."""
    return stream_df.groupBy("doc_id").applyInPandasWithState(
        _upsert_fn,
        outputStructType=UPSERT_OUT_SCHEMA,
        stateStructType=UPSERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
