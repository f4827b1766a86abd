"""E66 z-order layout: interleave replay, write-path plan shape (one
range exchange, no global sort), and the actual point of the exercise —
measured zone-map skipping: a two-axis box predicate must need strictly
fewer row groups under the z-ordered layout than under the natural
(insertion-order) layout, in BOTH dimensions."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from seizury_hrv_featuresextraction_spark.operators.layout import (
    doc_zorder_dims,
    scan_fraction,
    write_zordered,
    zone_maps,
    zorder_key,
    zorder_keys_docs,
)


def _ref_interleave(a: int, b: int, bits: int = 8) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    # doc_id walks the grid so insertion order correlates with NEITHER
    # dimension alone nor their box product
    rows = [
        (i, f"src{(i * 7) % 16}", ((i * 37) % 256) * 16 + 3, "t")
        for i in range(4096)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars int, text string")


def test_zorder_key_matches_python_replay(spark, docs):
    got = {
        r.doc_id: (r.len_bucket, r.src_bucket, r.zkey)
        for r in zorder_keys_docs(docs).collect()
    }
    for r in docs.select("doc_id", "source", "n_chars").collect():
        lb = min(r.n_chars // 16, 255)
        sb = int(hashlib.md5(r.source.encode()).hexdigest()[:2], 16)
        assert got[r.doc_id] == (lb, sb, _ref_interleave(lb, sb)), r.doc_id
    # key computation is scan-stage: zero exchanges, zero joins
    plan = zorder_keys_docs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_zorder_locality_beats_natural_layout(spark, docs, tmp_path):
    nat, zo = str(tmp_path / "nat"), str(tmp_path / "zo")
    # natural layout: insertion order, same file count
    docs.repartitionByRange(16, "doc_id").sortWithinPartitions("doc_id").write.parquet(nat)
    write_zordered(docs, zo, doc_zorder_dims(F.col("n_chars"), F.col("source")), 16)

    zm_nat = zone_maps(nat, ["n_chars", "source"])
    zm_zo = zone_maps(zo, ["n_chars", "source"])
    assert len(zm_zo) >= 16

    # box predicate: short docs (len_bucket < 64 -> n_chars < 1024)
    # from the low source-hash half; plus each axis alone
    for preds in (
        {"n_chars": (0, 1023)},
        {"n_chars": (0, 1023), "source": ("src0", "src9")},
    ):
        f_nat = scan_fraction(zm_nat, preds)
        f_zo = scan_fraction(zm_zo, preds)
        assert f_zo < f_nat, (preds, f_zo, f_nat)
    # the box predicate must prune hard, not marginally
    box = {"n_chars": (0, 1023)}
    assert scan_fraction(zm_zo, box) <= 0.5

    # both layouts return identical data (layout is a physical choice)
    a = spark.read.parquet(nat).orderBy("doc_id").collect()
    b = spark.read.parquet(zo).orderBy("doc_id").collect()
    assert a == b


def test_write_zordered_plan_one_range_exchange(spark, docs, tmp_path):
    key = zorder_key(doc_zorder_dims(F.col("n_chars"), F.col("source")))
    shaped = (
        docs.withColumn("__zkey", key)
        .repartitionByRange(16, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    plan = shaped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" in plan.lower()
    # local sorts only — a global ORDER BY would show a second exchange
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# E70 incremental compaction
# ---------------------------------------------------------------------------


def test_compact_zordered_touches_only_owning_files(spark, docs, tmp_path):
    import glob
    import os

    from seizury_hrv_featuresextraction_spark.operators.layout import (
        compact_zordered,
    )

    path = str(tmp_path / "maintained")
    dims = doc_zorder_dims(F.col("n_chars"), F.col("source"))
    write_zordered(docs, path, dims, 16, keep_key=True)
    before = {
        os.path.basename(f): open(f, "rb").read()
        for f in glob.glob(path + "/*.parquet")
    }

    # a tight batch: one source, narrow length band -> few zkey ranges
    batch = spark.createDataFrame(
        [(100000 + i, "src1", 40 + i, "new") for i in range(30)],
        "doc_id long, source string, n_chars int, text string",
    )
    res = compact_zordered(spark, path, batch, dims)
    assert res["touched"] and len(res["touched"]) <= 4
    assert res["kept"] >= 12

    after = {
        os.path.basename(f): open(f, "rb").read()
        for f in glob.glob(path + "/*.parquet")
    }
    assert set(after) == set(before)  # same file names, no extras
    for name in before:
        if name in res["touched"]:
            assert after[name] != before[name]
        else:
            assert after[name] == before[name]  # untouched = byte-identical

    # read-back equals base + batch exactly
    got = {
        r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()
    }
    want = {r.doc_id for r in docs.select("doc_id").collect()} | {
        100000 + i for i in range(30)
    }
    assert got == want

    # layout invariant: files still z-sorted internally and their zkey
    # ranges still pairwise disjoint (so skipping math is preserved)
    from seizury_hrv_featuresextraction_spark.operators.layout import zone_maps

    spans = {}
    for row in zone_maps(path, ["__zkey"]):
        lo, hi = row["__zkey"]
        cur = spans.get(row["file"])
        spans[row["file"]] = (lo, hi) if cur is None else (min(cur[0], lo), max(cur[1], hi))
    ordered = sorted(spans.values())
    for (l1, h1), (l2, h2) in zip(ordered, ordered[1:]):
        assert h1 <= l2, (ordered,)


def test_compact_zordered_empty_batch_is_noop(spark, docs, tmp_path):
    import glob
    import os

    from seizury_hrv_featuresextraction_spark.operators.layout import (
        compact_zordered,
    )

    path = str(tmp_path / "noop")
    dims = doc_zorder_dims(F.col("n_chars"), F.col("source"))
    write_zordered(docs, path, dims, 8, keep_key=True)
    before = sorted(
        (os.path.basename(f), os.path.getsize(f))
        for f in glob.glob(path + "/*.parquet")
    )
    res = compact_zordered(spark, path, docs.limit(0), dims)
    assert res == {"touched": [], "kept": 8}
    after = sorted(
        (os.path.basename(f), os.path.getsize(f))
        for f in glob.glob(path + "/*.parquet")
    )
    assert after == before


def test_compact_zordered_batch_id_idempotent(spark, docs, tmp_path):
    """r7 advice: re-submitting an already-applied batch (same
    batch_id) must be a no-op — files byte-identical, no duplicated
    rows — instead of a row-duplicating double-apply."""
    import glob
    import os

    from seizury_hrv_featuresextraction_spark.operators.layout import (
        compact_zordered,
    )

    path = str(tmp_path / "idem")
    dims = doc_zorder_dims(F.col("n_chars"), F.col("source"))
    write_zordered(docs, path, dims, 8, keep_key=True)
    batch = spark.createDataFrame(
        [(200000 + i, "src1", 60 + i, "new") for i in range(10)],
        "doc_id long, source string, n_chars int, text string",
    )
    res1 = compact_zordered(spark, path, batch, dims, batch_id="b-001")
    assert res1["touched"]
    after1 = sorted(
        (os.path.basename(f), open(f, "rb").read())
        for f in glob.glob(path + "/*.parquet")
    )
    n1 = spark.read.parquet(path).count()

    res2 = compact_zordered(spark, path, batch, dims, batch_id="b-001")
    assert res2 == {"touched": [], "kept": 8, "skipped": "b-001"}
    after2 = sorted(
        (os.path.basename(f), open(f, "rb").read())
        for f in glob.glob(path + "/*.parquet")
    )
    assert after2 == after1
    assert spark.read.parquet(path).count() == n1


def test_compact_zordered_crash_recovery(spark, docs, tmp_path):
    """Crash-safety of the two-phase commit:

    - crash mid-STAGE (stage dir written, no manifest): the live table
      is bit-identical; the next compaction discards the debris.
    - crash mid-COMMIT (manifest journaled, only some renames done):
      the next call completes the remaining renames and records the
      batch as applied, so the interrupted batch lands EXACTLY once.
    """
    import glob
    import json
    import os
    import shutil

    from seizury_hrv_featuresextraction_spark.operators.layout import (
        compact_zordered,
        recover_compact,
    )

    path = str(tmp_path / "crash")
    dims = doc_zorder_dims(F.col("n_chars"), F.col("source"))
    write_zordered(docs, path, dims, 8, keep_key=True)
    batch = spark.createDataFrame(
        [(300000 + i, "src2", 80 + i, "new") for i in range(10)],
        "doc_id long, source string, n_chars int, text string",
    )

    # reference run on a CLONE: what a clean one-shot apply produces
    ref = str(tmp_path / "ref")
    shutil.copytree(path, ref)
    compact_zordered(spark, ref, batch, dims, batch_id="b-x")
    want = {
        (r["doc_id"], r["source"]) for r in spark.read.parquet(ref).collect()
    }

    # crash mid-STAGE: stage debris, no manifest -> table untouched
    os.makedirs(os.path.join(path, "_compact_stage", "junk"), exist_ok=True)
    before = sorted(
        (os.path.basename(f), open(f, "rb").read())
        for f in glob.glob(path + "/*.parquet")
    )
    assert recover_compact(spark, path) is False
    assert not os.path.exists(os.path.join(path, "_compact_stage"))
    assert before == sorted(
        (os.path.basename(f), open(f, "rb").read())
        for f in glob.glob(path + "/*.parquet")
    )

    # crash mid-COMMIT: run the real stage phase, then simulate a crash
    # where only the FIRST rename happened, by doing it manually
    import seizury_hrv_featuresextraction_spark.operators.layout as layout_mod

    orig_replay = layout_mod._replay_compact_manifest

    def crash_replay(p, renames):
        orig_replay(p, renames[:1])  # first file lands, then "crash"
        raise RuntimeError("simulated crash mid-commit")

    layout_mod._replay_compact_manifest = crash_replay
    try:
        try:
            compact_zordered(spark, path, batch, dims, batch_id="b-x")
        except RuntimeError:
            pass
    finally:
        layout_mod._replay_compact_manifest = orig_replay
    assert os.path.exists(os.path.join(path, "_compact_manifest.json"))

    # next call (any batch) first finishes the pending commit
    assert recover_compact(spark, path) is True
    assert not os.path.exists(os.path.join(path, "_compact_manifest.json"))
    with open(os.path.join(path, "_compact_applied.json")) as fh:
        assert "b-x" in json.load(fh)
    got = {(r["doc_id"], r["source"]) for r in spark.read.parquet(path).collect()}
    assert got == want
    # and re-submitting the recovered batch is now a no-op
    res = compact_zordered(spark, path, batch, dims, batch_id="b-x")
    assert res["skipped"] == "b-x"
