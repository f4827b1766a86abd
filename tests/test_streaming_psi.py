"""E85-S streaming PSI: drained multi-trigger current-side bin counts
== batch counts cell-for-cell; assembled PSI == batch drift_psi."""

from __future__ import annotations

from pyspark.sql import types as T

from seizury_hrv_featuresextraction_spark.operators.stats import drift_psi
from seizury_hrv_featuresextraction_spark.streaming.sketch_stream import (
    streaming_psi_bins,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

BATCH1 = [(0, 3.0), (1, 17.0), (2, 42.0), (3, -2.0)]
BATCH2 = [(4, 42.5), (5, 99.0), (6, 17.1), (7, 1000.0)]
REF = [(100 + i, float((i % 5) * 10 + 2)) for i in range(50)]
WIDTH, NBINS = 10.0, 6


def test_streaming_psi_bins_match_batch_and_assemble(spark, tmp_path):
    src = str(tmp_path / "vals_src")
    spark.createDataFrame(BATCH1, SCHEMA).write.parquet(src + "/f1")
    spark.createDataFrame(BATCH2, SCHEMA).write.parquet(src + "/f2")

    stream_in = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        streaming_psi_bins(stream_in, "value", WIDTH, NBINS)
        .writeStream.format("memory")
        .queryName("psi_bins")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert q.recentProgress and len(q.recentProgress) >= 2  # genuinely incremental

    # counts monotone -> current histogram = max per bin over updates
    drained = {
        r["bin"]: r["c"]
        for r in spark.sql(
            "select bin, max(cnt_cur) as c from psi_bins group by bin"
        ).collect()
    }
    assert len(drained) <= NBINS  # bounded state

    ref = spark.createDataFrame(REF, SCHEMA)
    cur = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    batch = drift_psi(ref, cur, "value", WIDTH, NBINS).collect()

    # cell-for-cell: every batch nonzero current count appears drained
    for r in batch:
        assert drained.get(r["bin"], 0) == r["cnt_cur"], r["bin"]

    # assembled PSI from drained counts == batch drift_psi psi_terms
    import math

    ref_counts = {r["bin"]: r["cnt_ref"] for r in batch}
    n_ref = sum(ref_counts.values())
    n_cur = sum(drained.values())
    for r in batch:
        p_r = (ref_counts[r["bin"]] + 1) / (n_ref + NBINS)
        p_c = (drained.get(r["bin"], 0) + 1) / (n_cur + NBINS)
        assert r["psi_term"] == round((p_c - p_r) * math.log(p_c / p_r), 6)
