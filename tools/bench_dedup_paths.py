"""Measure the dedup scale paths against their brute-force baselines on
the FULL sf0.1 tables (no vec_id/doc caps) and write BENCH/dedup_paths.md.

The registered CORRECTNESS queries cap their inputs so the quadratic
baselines stay checkable; this harness is the scale evidence — same
operators, whole table, wall-clock side by side.

Usage: python tools/bench_dedup_paths.py  (env: SPARK_GRAFT_SF_DIR, CPUS)
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seizury_hrv_featuresextraction_spark.operators.dedup import (  # noqa: E402
    embedding_near_dups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from seizury_hrv_featuresextraction_spark.session import get_spark  # noqa: E402
from seizury_hrv_featuresextraction_spark.sources.registry import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(df):
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dedup-paths", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n_docs = docs.count()
    n_vecs = emb.count()

    rows = []

    # n-gram Jaccard: unrestricted shingle self-join vs LSH-candidate verify
    t_all, n_all = timed(
        ngram_jaccard_pairs(docs, "text", "doc_id", shingle_words=3, min_jaccard=0.2)
    )
    cand = minhash_lsh_pairs(docs, "text", "doc_id", n_hashes=4, band_size=2, shingle_words=3)
    t_lsh, n_lsh = timed(
        ngram_jaccard_pairs(docs, "text", "doc_id", shingle_words=3, min_jaccard=0.2,
                            candidates=cand)
    )
    rows.append(("n-gram Jaccard", f"{n_docs} docs", t_all, n_all, t_lsh, n_lsh))

    # embedding near-dup: brute-force all-pairs vs hyperplane-LSH buckets
    t_bf, n_bf = timed(embedding_near_dups(emb, "embedding", "vec_id", min_cosine=0.25))
    t_b, n_b = timed(
        embedding_near_dups(emb, "embedding", "vec_id", min_cosine=0.25, n_planes=4)
    )
    rows.append(("embedding near-dup", f"{n_vecs} vecs", t_bf, n_bf, t_b, n_b))

    lines = [
        "# Dedup scale-path vs baseline (full tables, no caps)",
        "",
        f"Input: `{sf_dir}` on local[{cpus}]. The CORRECTNESS queries run both",
        "variants on capped inputs with DuckDB value-hash twins; this table is",
        "the wall-clock evidence that the registered scale paths win, and by",
        "how much, when the quadratic baselines are still feasible at all.",
        "",
        "| operator | input | baseline (s) | baseline pairs | scale path (s) | scale pairs | speedup |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, inp, tb, nb_, ts, ns in rows:
        lines.append(
            f"| {name} | {inp} | {tb:.2f} | {nb_} | {ts:.2f} | {ns} | {tb / ts:.1f}x |"
        )
    lines += [
        "",
        "Scale-path pair counts are subsets of the baselines by construction",
        "(LSH recall < 1); the asymptotic story is the point: the baselines are",
        "O(n^2) in hot shingles / corpus size, the scale paths are linear in",
        "candidates / bucket occupancy and stay feasible at 100 TB.",
    ]
    out = os.path.join(REPO, "BENCH", "dedup_paths.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-12:]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
