"""E52c bench: BPE training wall at realistic merge counts.

The sf0.1 `documents` corpus has only 31 distinct words (synthetic
generator), so BPE exhausts at 107 merges there — useless for probing
the k=1024+ regime. This bench synthesizes a DETERMINISTIC rich-vocab
corpus (seeded md5-derived words, Zipf-ish frequencies; no external
data) and measures:

1. driver-local trainer (`bpe_train_merges_local`) wall at k in
   {256, 1024, 4096} — the production path;
2. distributed per-round trainer (`bpe_train_merges`) wall at a small
   k, extrapolated linearly to k=1024 (each round is one Spark job, so
   wall/k is the scheduler floor regardless of corpus size).

Run: python tools/bench_bpe.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seizury_hrv_featuresextraction_spark.session import get_spark  # noqa: E402


def synth_corpus(spark, n_words: int = 20_000, n_docs: int = 4_000, words_per_doc: int = 120):
    """Deterministic rich-vocab corpus: word w_i is the letter-mapped
    md5 of i (length 3-12), doc d samples words with a Zipf-ish bias
    toward low ids via a second md5 stream. Pure function of (i, d)."""
    rows = []
    lex = []
    for i in range(n_words):
        h = hashlib.md5(f"w{i}".encode()).hexdigest()
        ln = 3 + (int(h[:2], 16) % 10)
        lex.append("".join(chr(ord("a") + int(c, 16) % 26) for c in h[:ln]))
    for d in range(n_docs):
        ws = []
        for j in range(words_per_doc):
            u = int(hashlib.md5(f"d{d}:{j}".encode()).hexdigest()[:12], 16)
            # Zipf-ish: square the unit draw so low ids are hot
            frac = (u / 16**12) ** 2
            ws.append(lex[int(frac * n_words) % n_words])
        rows.append((d, " ".join(ws)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    from seizury_hrv_featuresextraction_spark.operators.curation import (
        bpe_train_merges,
        bpe_train_merges_local,
    )

    spark = get_spark("bench-bpe")
    docs = synth_corpus(spark).cache()
    n = docs.count()
    out: dict = {"n_docs": n}

    local_walls = {}
    merges_by_k = {}
    for k in (256, 1024, 4096):
        t0 = time.time()
        m = bpe_train_merges_local(docs, "text", k=k)
        local_walls[k] = round(time.time() - t0, 2)
        merges_by_k[k] = m
        print(f"local  k={k:5d}: {local_walls[k]:7.2f} s  ({len(m)} merges)")
    out["local_wall_s"] = local_walls

    k_dist = 16
    t0 = time.time()
    md = bpe_train_merges(docs, "text", k=k_dist)
    dist_wall = time.time() - t0
    per_round = dist_wall / max(len(md), 1)
    out["distributed_k16_wall_s"] = round(dist_wall, 2)
    out["distributed_per_round_s"] = round(per_round, 3)
    out["distributed_k1024_extrapolated_s"] = round(per_round * 1024, 1)
    print(
        f"dist   k={k_dist:5d}: {dist_wall:7.2f} s  ->  {per_round:.2f} s/round  "
        f"->  k=1024 ~ {per_round * 1024 / 60:.1f} min extrapolated"
    )

    assert md == merges_by_k[256][:k_dist], "local/distributed merge divergence!"
    print("prefix check: distributed k=16 == local[:16]  OK")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
