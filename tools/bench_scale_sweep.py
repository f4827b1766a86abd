"""Throughput-flatness sweep: the flagship at growing input sizes on the
same local[32] session. The 100x question in miniature — if tokens/sec
is flat from 4M to 100M tokens, the plan has no size-superlinear stage
(no driver collect, no accumulating state, no spill cliff at these
partition sizes). Writes BENCH/scale_sweep.md.
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seizury_hrv_featuresextraction_spark.config import DEFAULT_CONFIG  # noqa: E402
from seizury_hrv_featuresextraction_spark.plans.hrv_pipeline import extract_features  # noqa: E402
from seizury_hrv_featuresextraction_spark.session import get_spark  # noqa: E402
from seizury_hrv_featuresextraction_spark.sources.registry import (  # noqa: E402
    annotations_from_events,
    sequences_from_events,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="scale-sweep", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ann = annotations_from_events(spark, sf_dir)
    rows = []
    repeats = tuple(int(x) for x in os.environ.get(
        "SWEEP_REPEATS", "10,40,200,1000,2500").split(","))
    for repeat in repeats:
        seq = sequences_from_events(spark, sf_dir)
        seq = seq.withColumn(
            "tokens", F.flatten(F.array_repeat(F.col("tokens"), repeat))
        ).withColumn("n_tok", F.size("tokens").cast("int")).persist()
        n_tok = seq.agg(F.sum("n_tok")).collect()[0][0]
        best, n_win = 1e18, 0
        for _ in range(2):
            t0 = time.time()
            n_win = extract_features(seq, ann, DEFAULT_CONFIG).count()
            best = min(best, time.time() - t0)
        seq.unpersist()
        rows.append((n_tok, n_win, best, n_tok / best))
        print(f"{n_tok/1e6:.0f}M tokens: {best:.2f}s -> {n_tok/best/1e6:.3f}M tok/s "
              f"({n_win} windows)", flush=True)

    base = rows[2][3]  # 20M-token point = the standard bench input
    lines = [
        "# Throughput-flatness sweep (flagship, local[%d], %s)" % (cpus, sf_dir),
        "",
        "Same plan, growing input. Flat tokens/sec across a 25x size range",
        "means no size-superlinear stage (no driver-side accumulation, no",
        "spill cliff) — the local-mode proxy for the 100x scale-up question.",
        "Timings best-of-2 on a warmed session.",
        "",
        "| tokens | windows | wall (s) | tokens/sec | vs 20M-token point |",
        "|---|---|---|---|---|",
    ]
    for n_tok, n_win, best, tps in rows:
        lines.append(
            f"| {n_tok/1e6:.0f}M | {n_win} | {best:.2f} | {tps/1e6:.3f}M | {tps/base:.2f}x |"
        )
    out = os.path.join(REPO, "BENCH", "scale_sweep.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
