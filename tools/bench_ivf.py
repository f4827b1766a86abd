"""IVF multi-probe recall/latency curve at sf1.0 (r6 VERDICT ask #5).

Trains centroids once (n_lists=16), then sweeps n_probe over the sf1.0
embeddings table (20k vectors after the 10x stress synthesis): recall@k
vs the exact brute-force top-k on a deterministic query sample, plus
best-of-K wall per search. Appends an '## IVF' section to
BENCH/dedup_paths.md (replacing a previous run of the same section).

Usage: python tools/bench_ivf.py [sf_dir]  (default /tmp/sf1.0; regen
with tools/make_sf1.py)
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seizury_hrv_featuresextraction_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
    train_centroids,
)
from seizury_hrv_featuresextraction_spark.session import get_spark  # noqa: E402
from seizury_hrv_featuresextraction_spark.sources.registry import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 10
N_LISTS = 16
N_QUERIES = 100
BEST_OF = 2
PROBES = (1, 2, 4, 8, 16)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    spark = get_spark()
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    n = emb.count()
    # deterministic query sample: md5-smallest vec_ids
    qs = (
        emb.withColumn(
            "__h", F.conv(F.substring(F.md5(F.concat(F.lit("q:"), F.col("vec_id").cast("string"))), 1, 15), 16, 10).cast("long")
        )
        .orderBy("__h")
        .limit(N_QUERIES)
        .drop("__h")
        .cache()
    )
    qs.count()

    exact = brute_force_topk(emb, qs, "embedding", "vec_id", k=K)
    truth = {}
    t0 = time.time()
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["corpus_id"])
    brute_wall = time.time() - t0

    cent = train_centroids(emb, "embedding", "vec_id", n_lists=N_LISTS).cache()
    cent.count()

    lines = [
        f"## IVF multi-probe recall/latency ({sf_dir.rsplit('/', 1)[-1]}, {n} vectors, n_lists={N_LISTS}, k={K}, {N_QUERIES} queries, best-of-{BEST_OF})",
        "",
        f"Exact brute-force baseline: {brute_wall:.2f}s (scan cost 1.0x by definition).",
        "",
        "| n_probe | recall@10 | wall (s) | vs brute |",
        "|---|---|---|---|",
    ]
    for n_probe in PROBES:
        best, rec = 1e18, 0.0
        for _ in range(BEST_OF):
            t0 = time.time()
            got = {}
            res = ivf_topk(emb, qs, "embedding", "vec_id", k=K, n_lists=N_LISTS, n_probe=n_probe, centroids=cent)
            for r in res.collect():
                got.setdefault(r["query_id"], set()).add(r["corpus_id"])
            best = min(best, time.time() - t0)
            hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
            rec = hits / sum(len(t) for t in truth.values())
        lines.append(f"| {n_probe} | {rec:.3f} | {best:.2f} | {best / brute_wall:.2f}x |")
        print(lines[-1], flush=True)
    lines += [
        "",
        "Reading: recall climbs toward 1.0 as n_probe -> n_lists (n_probe=16",
        "is exhaustive). Wall at this scale is dominated by per-query window",
        "overhead, not the scan — at 100 TB the scan-cost ratio ~n_probe/n_lists",
        "is what the probed-list restriction buys (the corpus-side assignment",
        "is shuffle-free broadcast argmax either way).",
        "",
    ]
    path = os.path.join(REPO, "BENCH", "dedup_paths.md")
    old = open(path).read()
    marker = "\n## IVF multi-probe recall/latency"
    i = old.find(marker)
    if i >= 0:
        j = old.find("\n## ", i + 1)
        old = old[:i] + (old[j:] if j >= 0 else "")
    with open(path, "w") as f:
        f.write(old.rstrip("\n") + "\n\n" + "\n".join(lines))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
