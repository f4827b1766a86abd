"""E55 global line dedup: keeper rule, within-doc repeats, vanishing
all-duplicate docs, reassembly order, and plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from seizury_hrv_featuresextraction_spark.operators.dedup import line_dedup

# span_words=2 lines:  doc0: [a b][c d][a b]  doc1: [a b][x y]  doc2: [a b][c d]
DOCS = [
    (0, "a b c d a b"),
    (1, "a b x y"),
    (2, "a b c d"),
    (3, "tail"),  # single short line
]


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_line_dedup_keeper_and_reassembly(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.total_lines, r.kept_lines, r.text_md5)
        for r in line_dedup(docs, span_words=2).collect()
    }
    # doc0 keeps [a b] (global first) and [c d]; its own repeat of [a b] drops
    assert got[0] == (3, 2, _md5("a b c d"))
    # doc1: [a b] seen at doc0 -> drops; [x y] survives
    assert got[1] == (2, 1, _md5("x y"))
    # doc2 duplicates doc0 entirely -> vanishes
    assert 2 not in got
    # short trailing line survives untouched
    assert got[3] == (1, 1, _md5("tail"))


def test_line_dedup_null_and_empty_docs_vanish(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, ""), (2, None)], "doc_id long, text string"
    )
    out = line_dedup(docs, span_words=2).collect()
    assert {r.doc_id for r in out} == {0}


def test_line_dedup_plan_shape(spark):
    """One corpus scan, one line-hash exchange (window min), one doc_id
    exchange (reassembly) — no joins anywhere."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = line_dedup(docs, span_words=2)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    assert plan.count("Scan ExistingRDD") == 1
