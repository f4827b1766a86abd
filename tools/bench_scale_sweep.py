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
    from seizury_hrv_featuresextraction_spark.plans.hrv_pipeline import (  # noqa: E402
        choose_fused,
        plan_stats,
    )

    for repeat in repeats:
        seq = sequences_from_events(spark, sf_dir)
        seq = seq.withColumn(
            "tokens", F.flatten(F.array_repeat(F.col("tokens"), repeat))
        ).withColumn("n_tok", F.size("tokens").cast("int")).persist()
        n_tok = seq.agg(F.sum("n_tok")).collect()[0][0]
        stats = plan_stats(seq, DEFAULT_CONFIG)
        pick = "fused" if choose_fused(stats, DEFAULT_CONFIG) else "chunked"
        # the three plan variants interleaved per round (this box drifts
        # within a process — sequential blocks bias the last config)
        best = {"chunked": 1e18, "fused": 1e18, "auto": 1e18}
        n_win = 0
        for _ in range(2):
            for name, fused_arg in (("chunked", False), ("fused", True), ("auto", None)):
                t0 = time.time()
                n_win = extract_features(seq, ann, DEFAULT_CONFIG, fused=fused_arg, stats=stats).count()
                best[name] = min(best[name], time.time() - t0)
        seq.unpersist()
        rows.append((n_tok, n_win, best["chunked"], best["fused"], best["auto"], pick))
        print(
            f"{n_tok/1e6:.0f}M tokens: chunked {n_tok/best['chunked']/1e6:.3f} / "
            f"fused {n_tok/best['fused']/1e6:.3f} / auto {n_tok/best['auto']/1e6:.3f} "
            f"M tok/s (pick={pick}, {n_win} windows)",
            flush=True,
        )

    base = rows[2][0] / rows[2][4]  # 20M-token auto point = standard bench input
    lines = [
        "# Throughput-flatness sweep (flagship, local[%d], %s)" % (cpus, sf_dir),
        "",
        "Same plan, growing input. Flat tokens/sec across the size range",
        "means no size-superlinear stage (no driver-side accumulation, no",
        "spill cliff) — the local-mode proxy for the 100x scale-up question.",
        "All three physical-plan variants timed INTERLEAVED best-of-2 on a",
        "warmed session under the SAME action; `pick` is what stats-driven",
        "auto selection chose. Crossover: below ~500k tokens/core the job",
        "is overhead-dominated and fused's avoided shuffle wins; above it",
        "the plans converge and chunked's skew rebalancing edges ahead",
        "(the skew guard independently forces chunked once replicated docs",
        "exceed the per-task window headroom).",
        "",
        "| tokens | windows | chunked tok/s | fused tok/s | auto tok/s | auto pick | auto vs 20M |",
        "|---|---|---|---|---|---|---|",
    ]
    for n_tok, n_win, c_s, f_s, a_s, pick in rows:
        lines.append(
            f"| {n_tok/1e6:.0f}M | {n_win} | {n_tok/c_s/1e6:.3f}M | {n_tok/f_s/1e6:.3f}M "
            f"| {n_tok/a_s/1e6:.3f}M | {pick} | {n_tok/a_s/base:.2f}x |"
        )
    out = os.path.join(REPO, "BENCH", "scale_sweep.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
