"""E66: Z-order (Morton) clustering layout + zone-map skipping evidence.

Reference parity: the reference's per-recording directory layout
(hrv_pipeline.py output tree) is one-dimensional clustering — a scan
filtered by recording reads only that recording's files.  A 100 TB
curation corpus is queried along SEVERAL axes at once (length band AND
source/quality band for batch-shape-aware sampling); clustering by one
axis leaves the other unclustered, so every file's min/max zone maps
span the full range of the second axis and nothing is skipped.

The classic warehouse answer (Delta/Iceberg OPTIMIZE ZORDER BY) is to
sort by the bit-interleave of bucketized dimension keys: locality in
EVERY interleaved dimension, so parquet's per-file/row-group min-max
statistics become tight boxes and a predicate on ANY subset of the
dimensions prunes most of the data at metadata time — Spark's parquet
reader does the skipping natively via pushed filters on the RAW
columns; the z-key never has to appear in queries.

Everything here is exact integer arithmetic (shift/and/or), plan-side
codegen, zero shuffle for key computation; the write path adds exactly
one range exchange (the clustering sort), amortized over every future
scan.  Cross-engine: the twin replays the interleave bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(dims: list[Column], bits: int = 8) -> Column:
    """Bit-interleave of ``dims`` (each an integer in [0, 2^bits)):
    bit b of dim d lands at position b*len(dims) + d.  Pure codegen —
    bits*len(dims) shift/and/shift terms, no UDF, no shuffle."""
    ndims = len(dims)
    terms = []
    for d_idx, dim in enumerate(dims):
        lng = dim.cast("long")
        for b in range(bits):
            bit = F.shiftright(lng, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * ndims + d_idx))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def doc_zorder_dims(n_chars: Column, source: Column, bits: int = 8) -> list[Column]:
    """The documents-table instance: length band (n_chars // 16,
    capped) x a stable source hash byte (first 2 md5 hex chars) — the
    two axes batch-shape-aware sampling filters on together."""
    cap = (1 << bits) - 1
    len_bucket = F.least(F.floor(n_chars / F.lit(16)).cast("long"), F.lit(cap))
    src_bucket = F.conv(F.substring(F.md5(source), 1, 2), 16, 10).cast("long")
    return [len_bucket, src_bucket]


def zorder_keys_docs(df: DataFrame, bits: int = 8) -> DataFrame:
    """(doc_id, len_bucket, src_bucket, zkey) — the registered-query
    surface of the layout key (the write path below orders by zkey)."""
    dims = doc_zorder_dims(F.col("n_chars"), F.col("source"), bits)
    return df.select(
        "doc_id",
        dims[0].alias("len_bucket"),
        dims[1].alias("src_bucket"),
        zorder_key(dims, bits).alias("zkey"),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[Column],
    n_files: int,
    bits: int = 8,
    keep_key: bool = False,
) -> None:
    """Cluster ``df`` into ``n_files`` files ordered by the z-key of
    ``dims``: ONE range exchange + local sorts (never a global sort).
    By default the key is dropped — skipping works off the raw columns'
    zone maps; ``keep_key=True`` stores it as ``__zkey`` so the table
    can be INCREMENTALLY compacted (compact_zordered below) — the
    Iceberg sort-order-metadata trade, one long column at rest."""
    key = zorder_key(dims, bits)
    shaped = (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
    )
    if not keep_key:
        shaped = shaped.drop("__zkey")
    shaped.write.mode("overwrite").parquet(path)


def compact_zordered(
    spark,
    path: str,
    new_df: DataFrame,
    dims: list[Column],
    bits: int = 8,
    batch_id: str | None = None,
) -> dict:
    """E70: incremental OPTIMIZE for a ``keep_key`` z-ordered table —
    fold a (small) new batch in WITHOUT rewriting the table.

    Ingest writes land as small unclustered files; a full re-sort is a
    corpus-sized range shuffle every time.  Instead: read the existing
    files' __zkey ranges from their parquet FOOTERS (zone_maps — no
    data pages touched), assign each new row to the file whose range
    owns its z-key (range-partition boundaries recovered from
    metadata), and rewrite ONLY the touched files, each merged with its
    assigned rows and re-sorted locally.  Untouched files are not
    opened, not rewritten, not even read — compaction cost scales with
    the BATCH, not the table.  Returns {"touched": [...], "kept": n}.
    Crash safety + idempotency (r7 advice): all merged files are STAGED
    first (table untouched while any data work runs), then committed by
    a short rename pass journaled in ``_compact_manifest.json`` — a
    crash mid-stage leaves the table bit-identical and the rerun starts
    clean; a crash mid-commit is finished by the next call (renames are
    replayed from the manifest, already-moved parts skipped). With a
    ``batch_id``, fully-applied batches are recorded in
    ``_compact_applied.json`` and re-submitting one is a no-op instead
    of a row-duplicating double-apply.

    Layout invariants (file-disjoint zkey ranges, zone-map skipping,
    read-back equality with a full re-sort) are pytest-pinned
    (tests/test_layout.py)."""
    import os

    recover_compact(spark, path)
    maps = zone_maps(path, ["__zkey"])
    # per-file zkey range (one row group per file in this layout; take
    # the span defensively if there are several)
    ranges: dict[str, tuple] = {}
    for row in maps:
        lo, hi = row["__zkey"]
        cur = ranges.get(row["file"])
        ranges[row["file"]] = (
            (lo, hi) if cur is None else (min(cur[0], lo), max(cur[1], hi))
        )
    # range-partition ownership: file f owns [lo_f, lo_{f+1})
    order = sorted(ranges, key=lambda f: ranges[f][0])
    bounds = [ranges[f][0] for f in order]

    key = zorder_key(dims, bits)
    batch = new_df.withColumn("__zkey", key)
    # ownership as a literal CASE chain over the bounded file list —
    # evaluated scan-stage on the batch, no join
    owner = F.lit(order[0])
    for f, lo in zip(order[1:], bounds[1:]):
        owner = F.when(F.col("__zkey") >= F.lit(lo), F.lit(f)).otherwise(owner)
    batch = batch.withColumn("__owner", owner)

    import glob
    import json
    import shutil

    applied_log = os.path.join(path, "_compact_applied.json")
    if batch_id is not None and os.path.exists(applied_log):
        with open(applied_log) as fh:
            if batch_id in json.load(fh):
                return {"touched": [], "kept": len(order), "skipped": batch_id}

    touched = [r["__owner"] for r in batch.select("__owner").distinct().collect()]

    # phase 1 — STAGE: all merged files land under _compact_stage/;
    # the live table is not modified while any Spark job can still fail
    stage = os.path.join(path, "_compact_stage")
    shutil.rmtree(stage, ignore_errors=True)
    staged: list[tuple[str, str]] = []
    for f in touched:
        old = spark.read.parquet(os.path.join(path, f))
        add = batch.where(F.col("__owner") == f).drop("__owner").select(*old.columns)
        merged = old.unionByName(add).coalesce(1).sortWithinPartitions("__zkey")
        tmp = os.path.join(stage, f)
        merged.write.mode("overwrite").parquet(tmp)
        staged.append((glob.glob(os.path.join(tmp, "*.parquet"))[0], f))

    # phase 2 — COMMIT: journal the rename plan, then a short replay-
    # able rename pass (recover_compact finishes it after a crash)
    manifest = os.path.join(path, "_compact_manifest.json")
    with open(manifest + ".tmp", "w") as fh:
        json.dump({"renames": staged, "batch_id": batch_id}, fh)
    os.replace(manifest + ".tmp", manifest)
    _replay_compact_manifest(path, staged)
    if batch_id is not None:
        done = []
        if os.path.exists(applied_log):
            with open(applied_log) as fh:
                done = json.load(fh)
        with open(applied_log + ".tmp", "w") as fh:
            json.dump(done + [batch_id], fh)
        os.replace(applied_log + ".tmp", applied_log)
    os.remove(manifest)
    shutil.rmtree(stage, ignore_errors=True)
    # in-place replacement invalidates Spark's cached file statuses
    # (size mismatch -> FAILED_READ_FILE on the next scan otherwise)
    spark.catalog.refreshByPath(path)
    return {"touched": sorted(touched), "kept": len(order) - len(touched)}


def _replay_compact_manifest(path: str, renames: list) -> None:
    """Rename pass of compact_zordered's commit phase: idempotent —
    a staged part that is already gone was moved by a previous
    (crashed) attempt and is skipped."""
    import os

    for part, f in renames:
        if os.path.exists(part):
            os.replace(part, os.path.join(path, f))
        # Hadoop's local FS keeps .<name>.crc sidecars; the original
        # write's checksum is stale for the replaced bytes
        crc = os.path.join(path, f".{f}.crc")
        if os.path.exists(crc):
            os.remove(crc)


def recover_compact(spark, path: str) -> bool:
    """Finish a compaction interrupted mid-commit: if a journal exists,
    replay its renames (skipping already-moved parts), record its
    batch_id as applied, and clean up. A journal-less leftover stage
    dir (crash mid-STAGE) is discarded — the table was never touched.
    Returns True when a pending commit was completed."""
    import json
    import os
    import shutil

    manifest = os.path.join(path, "_compact_manifest.json")
    stage = os.path.join(path, "_compact_stage")
    if not os.path.exists(manifest):
        shutil.rmtree(stage, ignore_errors=True)
        return False
    with open(manifest) as fh:
        plan = json.load(fh)
    _replay_compact_manifest(path, plan["renames"])
    if plan.get("batch_id") is not None:
        applied_log = os.path.join(path, "_compact_applied.json")
        done = []
        if os.path.exists(applied_log):
            with open(applied_log) as fh:
                done = json.load(fh)
        if plan["batch_id"] not in done:
            with open(applied_log + ".tmp", "w") as fh:
                json.dump(done + [plan["batch_id"]], fh)
            os.replace(applied_log + ".tmp", applied_log)
    os.remove(manifest)
    shutil.rmtree(stage, ignore_errors=True)
    spark.catalog.refreshByPath(path)
    return True


def zone_maps(path: str, cols: list[str]) -> list[dict]:
    """Per-row-group min/max statistics from parquet footers (what a
    metadata-pruning reader consults before touching data pages)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            row = {"file": os.path.basename(fp), "rg": rg}
            g = md.row_group(rg)
            for c in cols:
                st = g.column(names[c]).statistics
                # a file written with statistics disabled has st None;
                # fail with intent instead of an opaque AttributeError
                # (compact_zordered's range recovery depends on these)
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"zone_maps: {fp} row-group {rg} has no min/max "
                        f"statistics for column {c!r} (written with "
                        "parquet statistics disabled?)"
                    )
                row[c] = (st.min, st.max)
            out.append(row)
    return out


def scan_fraction(maps: list[dict], preds: dict[str, tuple]) -> float:
    """Fraction of row groups a zone-map-pruning reader must read for
    a conjunction of closed-range predicates {col: (lo, hi)}."""
    need = 0
    for row in maps:
        hit = all(row[c][0] <= hi and row[c][1] >= lo for c, (lo, hi) in preds.items())
        need += hit
    return need / max(1, len(maps))
