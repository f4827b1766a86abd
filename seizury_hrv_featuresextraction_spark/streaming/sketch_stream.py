"""E63/E64-S: streaming-maintained sketches (count-min, HyperLogLog).

The batch CMS (operators/sketches.py, E58) needs nothing new to run on
a stream: the sketch IS a streaming aggregate — explode n-gram
occurrences, bucket them depth ways, groupBy (row, bucket) count. State
is bounded at depth x width cells REGARDLESS of stream length or
cardinality (the whole point of a sketch as streaming state — contrast
an exact streaming n-gram count, whose state grows with the distinct
set), and Spark's incremental aggregation maintains it exactly: after
draining any prefix of the stream, each cell equals the batch
``cms_build`` of the same rows (pinned by tests/test_streaming_sketch.py
across multi-file triggers).

Update-mode semantics: every trigger emits the cells it touched; the
CURRENT sketch is the latest value per (r, b) — counts are monotone, so
max-per-key over an update-mode sink reconstructs it. A downstream
heavy-hitter pass is batch work by design (the verify re-scan wants the
full corpus); at 100 TB the streaming side keeps the sketch CURRENT so
that pass never rebuilds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words
from ..operators.sketches import _bucket, _digest, ngram_stream_words


def streaming_cms_cells(
    stream_df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Incrementally maintained CMS cells over a document stream:
    (r, b, c) with c the running count of occurrences hashing to row
    r, bucket b. Works identically on a batch frame (same code path,
    the repo's batch/streaming-parity device)."""
    occ = (
        stream_df.select(words(F.col(text_col)).alias("ws"))
        .select(F.explode(ngram_stream_words(F.col("ws"), n)).alias("g"))
        .select(_digest(F.col("g")).alias("dg"))
    )
    cells = occ.select(
        F.posexplode(
            F.array(*[_bucket(F.col("dg"), r, width) for r in range(depth)])
        ).alias("r", "b")
    )
    return cells.groupBy("r", "b").agg(F.count(F.lit(1)).alias("c"))


def streaming_hll_registers(
    stream_df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    shingle_words: int = 3,
) -> DataFrame:
    """E64-S: incrementally maintained HyperLogLog registers over a
    document stream — (g, reg, rho) with rho the running MAX.  State is
    bounded at groups x 256 registers regardless of stream length or
    shingle cardinality, and max is the native streaming aggregate, so
    after draining any prefix each register equals the batch
    ``hll_register_table`` of the same rows; ``hll_estimate`` over the
    drained registers is then the batch estimate (parity pinned by
    tests/test_streaming_sketch.py).  Registers are monotone, so an
    update-mode sink reconstructs the current sketch as max-per-key."""
    from ..functions.text import word_shingles_of
    from ..operators.sketches import hll_register_table

    occ = stream_df.select(
        F.col(group_col).alias("g"), words(F.col(text_col)).alias("__ws")
    ).select("g", F.explode(word_shingles_of(F.col("__ws"), shingle_words)).alias("it"))
    return hll_register_table(occ, "it", "g")


def streaming_hdr_histogram(
    stream_df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """E68-S: the HDR quantile histogram maintained incrementally —
    (g, b, c) running bucket counts; state bounded at groups x
    O(4*log2(max)) buckets regardless of stream length.  Counts are
    monotone, so an update-mode sink reconstructs the current histogram
    as max-per-(g, b); feeding the drained histogram through the batch
    rank-selection (``hdr_quantile_sketch``'s window over bucket order)
    yields the exact batch quantiles of the rows seen so far (parity
    pinned by tests/test_streaming_sketch.py)."""
    from ..operators.sketches import hdr_bucket

    return (
        stream_df.select(
            F.col(group_col).alias("g"), hdr_bucket(F.col(value_col)).alias("b")
        )
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def streaming_psi_bins(
    stream_df: DataFrame,
    value_col: str,
    bin_width: float,
    n_bins: int,
) -> DataFrame:
    """E85-S: incrementally maintained current-side PSI bin counts over
    a feature stream — the streaming half of the drift monitor. Bin
    assignment is the SAME shared fixed-edge expression the batch
    drift_psi uses (operators/stats.py:psi_bin), so stream and batch
    bucket bit-identically; the groupBy is Spark's incremental
    aggregate with state bounded at n_bins rows REGARDLESS of stream
    length. Update-mode counts are monotone, so the current histogram
    is max-per-bin over the sink; the PSI assembly against the static
    reference histogram is the tiny batch tail (n_bins rows)."""
    from ..operators.stats import psi_bin

    return (
        stream_df.select(psi_bin(value_col, bin_width, n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt_cur"))
    )
