"""IVF-vs-brute crossover by CORPUS growth (r7 VERDICT ask #6).

At 20k vectors the sf1.0 sweep showed per-query overhead dominating —
IVF lost to brute force at every n_probe. The r8 map-local top-k
removed the candidate-shuffle window; this bench grows the VECTOR
count (queries fixed) and finds where IVF's ~n_probe/n_lists scan
fraction overtakes brute force on this box.

Corpus: sf1.0 embeddings (20k) replicated deterministically — replica
r negates dims where md5(r:vec_id) bits say so, keeping 64-dim unit
structure varied but reproducible (no external data, no RNG state).

Usage: python tools/bench_ivf_crossover.py [sf_dir]
Appends '## IVF crossover' to BENCH/dedup_paths.md.
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
    ivf_topk,
    train_centroids,
)
from seizury_hrv_featuresextraction_spark.session import get_spark  # noqa: E402
from seizury_hrv_featuresextraction_spark.sources.registry import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 10
N_LISTS = 16
N_PROBE = 4
N_QUERIES = 32
BEST_OF = 2
REPLICAS = (1, 4, 16, 32)


def replicate(emb, r: int):
    """Replica r of the corpus: vec_id offset by r*10^7; sign-flip dim i
    where bit (i % 60) of md5('f<r>:<id>') is set — deterministic, keeps
    norms, decorrelates replicas."""
    if r == 0:
        return emb
    # 64 hex chars (two md5s) -> flip dim i iff hex digit i is odd
    sid = F.col("vec_id").cast("string")
    hx = F.concat(
        F.md5(F.concat(F.lit(f"fa{r}:"), sid)), F.md5(F.concat(F.lit(f"fb{r}:"), sid))
    )
    digits = F.split(hx, "")
    flipped = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            F.pmod(F.conv(F.element_at(digits, (i + 1).cast("int")), 16, 10).cast("long"), F.lit(2)) == 1,
            -x,
        ).otherwise(x),
    )
    return emb.select(
        (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
        flipped.alias("embedding"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = base.filter(F.col("vec_id") < N_QUERIES).cache()
    qs.count()

    lines = [
        f"## IVF crossover by corpus growth (r8; {sf_dir.rsplit('/', 1)[-1]} x replicas, "
        f"n_lists={N_LISTS}, n_probe={N_PROBE}, k={K}, {N_QUERIES} queries, best-of-{BEST_OF}, arrow kernel both arms)",
        "",
        "| vectors | exhaustive (s) | ivf n_probe=4 (s) | ivf/exhaustive | recall@10 |",
        "|---|---|---|---|---|",
    ]
    for n_rep in REPLICAS:
        corpus = base
        for r in range(1, n_rep):
            corpus = corpus.unionByName(replicate(base, r))
        corpus = corpus.cache()
        n = corpus.count()

        cent = train_centroids(corpus, "embedding", "vec_id", n_lists=N_LISTS).cache()
        cent.count()
        # both arms run the Arrow/GEMM kernel: "brute" = exhaustive
        # probing (n_probe = n_lists scans every list), so the gap is
        # purely the scan fraction, not the scoring engine
        truth: dict = {}
        bw = 1e18
        for _ in range(BEST_OF):
            t0 = time.time()
            rows = ivf_topk(
                corpus, qs, "embedding", "vec_id", k=K,
                n_lists=N_LISTS, n_probe=N_LISTS, centroids=cent, kernel="arrow",
            ).collect()
            bw = min(bw, time.time() - t0)
        for r in rows:
            truth.setdefault(r["query_id"], set()).add(r["corpus_id"])

        iw, hits, total = 1e18, 0, 0
        for _ in range(BEST_OF):
            t0 = time.time()
            irows = ivf_topk(
                corpus, qs, "embedding", "vec_id", k=K,
                n_lists=N_LISTS, n_probe=N_PROBE, centroids=cent, kernel="arrow",
            ).collect()
            iw = min(iw, time.time() - t0)
        got: dict = {}
        for r in irows:
            got.setdefault(r["query_id"], set()).add(r["corpus_id"])
        for q, t in truth.items():
            hits += len(t & got.get(q, set()))
            total += len(t)
        rec = hits / max(1, total)
        lines.append(f"| {n} | {bw:.2f} | {iw:.2f} | {iw / bw:.2f}x | {rec:.3f} |")
        print(lines[-1], flush=True)
        corpus.unpersist()
        cent.unpersist()

    out = os.path.join(REPO, "BENCH", "dedup_paths.md")
    with open(out, "a") as fh:
        fh.write("\n" + "\n".join(lines) + "\n")
    print(f"appended to {out}")


if __name__ == "__main__":
    main()
