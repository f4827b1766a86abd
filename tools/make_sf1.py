"""One-off sf1.0 stress corpus (VERDICT r5 item 5).

The driver ships sf{0.001,0.01,0.1}; the float-threshold and LSH-recall
bug classes found so far only surfaced at the LARGEST available scale
(memory: the r2 window-membership ±1-beat flips were invisible at
sf0.01). This script derives a deterministic sf1.0 (10x docs, 10x
embeddings) from sf0.1 so the dedup/curation gate can be stress-run
once per round without driver support:

- documents: 10 replicas; replica r offsets doc_id by r*1_000_000 and
  ROTATES the word stream left by r*7 words (same length distribution,
  same vocabulary; replicas of a doc are mutual NEAR-dups — jaccard
  ~0.95+, sharing all word shingles except at the rotation seam — which
  is exactly the near-dup-heavy regime the LSH/banding paths must
  survive; replica 0 keeps the byte-identical original so exact-dup
  structure is preserved too).
- embeddings: 10 replicas; replica r offsets vec_id by r*1_000_000 and
  perturbs component i by 0.001 * ((31*i + 17*r) % 11 - 5) in float32 —
  planted tight cosine clusters of size 10.
- every other table is copied verbatim from sf0.1 (unscaled; the doc /
  embedding queries are the stress targets).

Everything is a pure function of the sf0.1 input — rerunning reproduces
the corpus bit-for-bit, and BOTH engines read the same parquet, so the
oracle comparison semantics are unchanged.

Usage: python tools/make_sf1.py [src_dir] [dst_dir]
       (defaults /root/testdata/sf0.1 -> /tmp/sf1.0)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

WORDS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), w -> w <> '')"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    con.execute(
        f"""
        COPY (
          WITH base AS (SELECT doc_id, text, lang, source, {WORDS} AS ws
                        FROM '{src}/documents.parquet'),
          reps AS (SELECT b.*, r.rep,
                          CASE WHEN len(ws) > 0 THEN (rep * 7) % len(ws) ELSE 0 END AS k
                   FROM base b, (SELECT unnest(generate_series(0, 9)) AS rep) r),
          rot AS (SELECT rep * 1000000 + doc_id AS doc_id,
                         CASE WHEN rep = 0 THEN text
                              ELSE array_to_string(ws[k+1:] || ws[1:k], ' ') END AS text,
                         lang, source
                  FROM reps)
          SELECT doc_id, text, lang, source, length(text)::bigint AS n_chars
          FROM rot ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT rep * 1000000 + vec_id AS vec_id,
                 list_transform(
                   list_zip(embedding, generate_series(0, len(embedding) - 1)),
                   z -> (z[1] + 0.001 * ((31 * z[2] + 17 * rep) % 11 - 5))::float
                 ) AS embedding,
                 label
          FROM '{src}/embeddings.parquet',
               (SELECT unnest(generate_series(0, 9)) AS rep)
          ORDER BY vec_id
        ) TO '{dst}/embeddings.parquet' (FORMAT parquet)
        """
    )
    for name in sorted(os.listdir(src)):
        if name.endswith(".parquet") and name not in ("documents.parquet", "embeddings.parquet"):
            tgt = os.path.join(dst, name)
            if not os.path.exists(tgt):
                shutil.copyfile(os.path.join(src, name), tgt)
    n_docs = con.execute(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    n_vec = con.execute(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    print(f"sf1.0 at {dst}: {n_docs} documents, {n_vec} embeddings")


if __name__ == "__main__":
    main()
