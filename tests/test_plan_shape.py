"""Physical-plan regression gates (SURVEY.md §4 design goals).

The flagship plan's scale story is structural: column-pruned scan, ONE
exchange on the main branch (the skew rebalancing), broadcast label join,
no extra shuffles sneaking in through refactors. Assert it from
the executed plan text so a regression fails loudly.
"""

from __future__ import annotations

import re

from seizury_hrv_featuresextraction_spark.config import DEFAULT_CONFIG, HRVConfig
from seizury_hrv_featuresextraction_spark.datagen import make_annotations, make_sequences, write_parquet
from seizury_hrv_featuresextraction_spark.plans.hrv_pipeline import extract_features


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _setup(spark, tmp_path):
    seq = make_sequences(6, short_range=(500, 800), long_range=(1000, 1200))
    write_parquet(seq, str(tmp_path / "seq.parquet"))
    write_parquet(make_annotations(seq), str(tmp_path / "ann.parquet"))
    return (
        spark.read.parquet(str(tmp_path / "seq.parquet")),
        spark.read.parquet(str(tmp_path / "ann.parquet")),
    )


def test_flagship_plan_one_shuffle_and_pruned_scan(spark, tmp_path):
    sdf, adf = _setup(spark, tmp_path)
    plan = _plan(extract_features(sdf, adf, DEFAULT_CONFIG))

    main_branch = plan.split("BroadcastExchange")[0]
    exchanges = re.findall(r"Exchange (\w+)", main_branch)
    assert len(exchanges) == 1, f"main branch must have exactly one shuffle, got {exchanges}"
    assert "RoundRobinPartitioning" in main_branch

    # label join is broadcast, not shuffled
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # the scan reads only (doc_id, tokens) — column pruning reached
    # parquet (match on the column set; the tmp path gets truncated in
    # the plan string)
    scans = [set(c.split("#")[0] for c in m.split(",")) for m in re.findall(r"FileScan parquet \[([^\]]*)\]", plan)]
    assert {"doc_id", "tokens"} in scans, scans


def test_fused_plan_zero_shuffles(spark, tmp_path):
    sdf, _ = _setup(spark, tmp_path)
    plan = _plan(extract_features(sdf, None, DEFAULT_CONFIG, fused=True))
    assert "Exchange" not in plan, plan
    assert "FileScan parquet" in plan


def test_label_side_stays_small_aggregates(spark, tmp_path):
    """The annotation branch may shuffle (it is tiny); the big side must
    not re-shuffle after the kernel stage."""
    sdf, adf = _setup(spark, tmp_path)
    plan = _plan(extract_features(sdf, adf, HRVConfig(max_windows_per_chunk=64)))
    after_kernel = plan.split("MapInArrow")[0]  # text above the top MapInArrow
    assert "Exchange" not in after_kernel.split("BroadcastExchange")[0].replace(
        "BroadcastExchange", ""
    )
