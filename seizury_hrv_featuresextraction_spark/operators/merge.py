"""MERGE INTO semantics for crawl-snapshot maintenance (E54) — the
table-management half of the incremental-ingestion story (E47/E50c are
the dedup half): fold a new crawl batch into the current corpus with
latest-wins conflict resolution and per-row action accounting, the
Iceberg ``MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED
INSERT`` contract expressed as ONE key-shuffle aggregate.

Spark-first shape: union the two sides with a provenance tag, then
``max_by(payload, (version, is_new))`` per key — a single hash exchange
with a map-side combine (each task reduces its local rows to one
candidate per key before the shuffle), no join, no window sort. At
100 TB the update batch is typically ~1% of the corpus: the shuffle
carries one combined row per touched key per map task, and AQE
coalesces the mostly-empty reducers.

Action accounting rides the same aggregate (max/min flags folded in the
combine), so inserted/updated/carried counts cost zero extra passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    key_col: str = "doc_id",
    version_col: str = "version",
) -> DataFrame:
    """Latest-wins merge of ``updates`` into ``current``.

    Both inputs share a schema (key, version, payload...). The winner
    per key is the row with the greatest (version, is_new) — an update
    beats a current row at the same version, so replaying the same
    batch is idempotent. Adds ``action``:

    - ``insert``  — key exists only in the update batch
    - ``update``  — key exists in both and an update row won
    - ``carry``   — key exists in both but the current row is newer
                    (late-arriving stale batch) or only in current
    """
    payload = [c for c in current.columns if c not in (key_col, version_col)]
    tagged = current.withColumn("is_new", F.lit(0)).unionByName(
        updates.withColumn("is_new", F.lit(1))
    )
    row = F.struct(version_col, "is_new", *payload)
    merged = tagged.groupBy(key_col).agg(
        F.max_by(row, F.struct(version_col, "is_new")).alias("w"),
        F.max("is_new").alias("any_new"),
        F.min("is_new").alias("all_new"),
    )
    action = (
        F.when(F.col("all_new") == 1, F.lit("insert"))
        .when((F.col("any_new") == 1) & (F.col("w.is_new") == 1), F.lit("update"))
        .otherwise(F.lit("carry"))
    )
    return merged.select(
        key_col,
        F.col(f"w.{version_col}").alias(version_col),
        *[F.col(f"w.{c}").alias(c) for c in payload],
        action.alias("action"),
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_col: str = "doc_id", fp_col: str = "fp"
) -> DataFrame:
    """E69: row-level diff between two crawl snapshots — (key, kind,
    fp_old, fp_new) with kind in {added, removed, changed}; unchanged
    rows are dropped (at 100 TB the diff is the small output, the
    snapshots are the big inputs).

    Same Spark-first shape as merge_upsert: union with a side tag, ONE
    key-shuffle aggregate with map-side combine — no join, no window.
    Content identity is the caller-supplied fingerprint column (the
    repo device: md5 over coalesce(text,'')), so 'changed' means the
    payload hash moved, not that bytes were re-read twice.  Keys are
    unique per snapshot (the snapshot contract merge_upsert maintains).
    The DuckDB twin is an INDEPENDENT formulation (FULL OUTER JOIN +
    NULL-side classification), so gate agreement checks the aggregate
    encoding itself."""
    tagged = (
        old.select(key_col, fp_col)
        .withColumn("side", F.lit(0))
        .unionByName(new.select(key_col, fp_col).withColumn("side", F.lit(1)))
    )
    agg = tagged.groupBy(key_col).agg(
        F.max("side").alias("has_new"),
        F.min("side").alias("all_new"),
        F.max(F.when(F.col("side") == 0, F.col(fp_col))).alias("fp_old"),
        F.max(F.when(F.col("side") == 1, F.col(fp_col))).alias("fp_new"),
    )
    kind = (
        F.when(F.col("all_new") == 1, F.lit("added"))
        .when(F.col("has_new") == 0, F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return agg.select(key_col, kind.alias("kind"), "fp_old", "fp_new").where(
        F.col("kind") != "unchanged"
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    content_col: str,
    version_col: str,
    current_version: int,
) -> DataFrame:
    """E107: slowly-changing-dimension type-2 history build from FULL
    snapshots — the standard warehouse change-tracking table the E54
    MERGE and E69 diff family lacks: one row per (key, contiguous run
    of identical content), with the version interval it was live. A
    version GAP (key absent from a snapshot) closes the run even if the
    content later reasserts — delete + re-insert are two rows, which is
    the difference between SCD2 and naive content dedup.

    Run detection: lag over the per-key version order; a new run starts
    when content changes OR version != prev_version + 1 (the gap rule).
    Everything is exact (versions int64, content compared as strings);
    is_current = run reaches ``current_version``.

    Scale shape: ONE exchange (the per-key window sort, reused by the
    run-id cumulative sum and the (key, run) collapse — same key);
    no joins, no amplification. Returns
    (key, content, valid_from, valid_to, is_current)."""
    w = Window.partitionBy(key_col).orderBy(version_col)
    d = (
        df.withColumn("__pc", F.lag(content_col).over(w))
        .withColumn("__pv", F.lag(version_col).over(w))
        .withColumn(
            "__new_run",
            # null-safe: first row detected via __pv (NULL content is a
            # legitimate value and must not fragment or merge runs), and
            # the content comparison via eqNullSafe — plain != yields
            # NULL around NULL-content rows, which F.sum then skips,
            # misassigning run ids (r8 review finding)
            (
                F.col("__pv").isNull()
                | ~F.col(content_col).eqNullSafe(F.col("__pc"))
                | (F.col(version_col) != F.col("__pv") + 1)
            ).cast("long"),
        )
        .withColumn(
            "__run",
            F.sum("__new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        d.groupBy(key_col, "__run", content_col)
        .agg(
            F.min(version_col).cast("long").alias("valid_from"),
            F.max(version_col).cast("long").alias("valid_to"),
        )
        .select(
            key_col,
            content_col,
            "valid_from",
            "valid_to",
            (F.col("valid_to") == F.lit(int(current_version))).alias("is_current"),
        )
    )
