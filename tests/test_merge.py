"""E54 MERGE upsert: action semantics, latest-wins conflict resolution,
replay idempotency, and the one-exchange/no-join plan shape."""

from __future__ import annotations

from seizury_hrv_featuresextraction_spark.operators.merge import merge_upsert

SCHEMA = "doc_id long, version long, text string"


def _rows(df):
    return {r.doc_id: (r.version, r.text, r.action) for r in df.collect()}


def test_merge_actions(spark):
    cur = spark.createDataFrame(
        [(1, 0, "a"), (2, 3, "b-newer"), (3, 0, "c")], SCHEMA
    )
    upd = spark.createDataFrame(
        [(1, 2, "a-rev2"), (2, 2, "b-stale"), (9, 2, "fresh")], SCHEMA
    )
    got = _rows(merge_upsert(cur, upd))
    assert got == {
        1: (2, "a-rev2", "update"),   # update wins on version
        2: (3, "b-newer", "carry"),   # stale replay loses
        3: (0, "c", "carry"),         # untouched key carries
        9: (2, "fresh", "insert"),    # new key inserts
    }


def test_merge_same_version_update_wins_and_replay_is_idempotent(spark):
    cur = spark.createDataFrame([(1, 2, "old-at-2")], SCHEMA)
    upd = spark.createDataFrame([(1, 2, "new-at-2")], SCHEMA)
    once = merge_upsert(cur, upd)
    assert _rows(once)[1] == (2, "new-at-2", "update")  # is_new breaks the tie
    # replaying the same batch against the merged table changes nothing
    again = merge_upsert(once.drop("action"), upd)
    assert _rows(again)[1][:2] == (2, "new-at-2")


def test_merge_plan_is_one_exchange_no_join(spark):
    cur = spark.createDataFrame([(1, 0, "a")], SCHEMA)
    upd = spark.createDataFrame([(1, 1, "b")], SCHEMA)
    plan = merge_upsert(cur, upd)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Window" not in plan


# ---------------------------------------------------------------------------
# E69 snapshot diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_kinds(spark):
    from seizury_hrv_featuresextraction_spark.operators.merge import snapshot_diff

    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, fp string"
    )
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (5, "e")], "doc_id long, fp string"
    )
    got = {r.doc_id: (r.kind, r.fp_old, r.fp_new) for r in snapshot_diff(v1, v2).collect()}
    assert got == {
        2: ("changed", "b", "B"),
        3: ("removed", "c", None),
        5: ("added", None, "e"),
    }  # key 1 and 4 unchanged -> dropped


def test_snapshot_diff_empty_sides(spark):
    from seizury_hrv_featuresextraction_spark.operators.merge import snapshot_diff

    v = spark.createDataFrame([(1, "a")], "doc_id long, fp string")
    empty = spark.createDataFrame([], "doc_id long, fp string")
    assert [r.kind for r in snapshot_diff(v, empty).collect()] == ["removed"]
    assert [r.kind for r in snapshot_diff(empty, v).collect()] == ["added"]
    assert snapshot_diff(v, v).collect() == []


def test_snapshot_diff_plan_one_exchange_no_join(spark):
    from seizury_hrv_featuresextraction_spark.operators.merge import snapshot_diff

    v1 = spark.createDataFrame([(1, "a")], "doc_id long, fp string")
    v2 = spark.createDataFrame([(1, "b")], "doc_id long, fp string")
    plan = snapshot_diff(v1, v2)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Window" not in plan


def test_scd2_history_runs_gaps_and_currency(spark):
    """E107: unchanged content collapses to one interval; a content
    change splits; a version GAP splits even when content reasserts
    (delete + re-insert = two rows); is_current only on runs reaching
    the final version."""
    from seizury_hrv_featuresextraction_spark.operators.merge import scd2_history

    rows = [
        # key 1: same content v1-v3 -> one current row
        (1, 1, "a"), (1, 2, "a"), (1, 3, "a"),
        # key 2: change at v2 -> two rows, second current
        (2, 1, "a"), (2, 2, "b"), (2, 3, "b"),
        # key 3: present v1, absent v2, SAME content v3 -> two rows (gap)
        (3, 1, "a"), (3, 3, "a"),
        # key 4: deleted after v1 -> one closed row
        (4, 1, "a"),
    ]
    df = spark.createDataFrame(rows, "k long, version long, content string")
    got = {
        (r["k"], r["valid_from"]): (r["content"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, "k", "content", "version", 3).collect()
    }
    assert got == {
        (1, 1): ("a", 3, True),
        (2, 1): ("a", 1, False),
        (2, 2): ("b", 3, True),
        (3, 1): ("a", 1, False),
        (3, 3): ("a", 3, True),
        (4, 1): ("a", 1, False),
    }
