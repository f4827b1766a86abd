"""sf1.0 stress verification for the E75 tokenizer_pipeline closure.

The registered DuckDB twin replays BFD packing as a recursive CTE whose
state row carries the per-shard bin-load LIST — O(bins^2/shard) list
elements through the recursion. At sf0.01/sf0.1 that is fine (gate
green); at the 50k-doc stress corpus with a 512-token budget it is
~6,250 bins/shard and the pure-SQL replay is impractical (>50 min).

This tool verifies the SAME closure at sf1.0 against an INDEPENDENT
pure-Python replay instead: dict-based Sennrich BPE train (the
test-suite reference implementation), greedy per-word encode + hashlib
md5 digests, bisect-replayed best-fit-decreasing packing (the exact
kernel policy), md5-ordered delivery digest. Every tuple of
(shard, bin, n_docs, bin_tokens, headroom, order_md5) must match.

Usage: python tools/verify_tokenizer_pipeline_sf1.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import time
from bisect import bisect_left, insort
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

BUDGET = 512
N_SHARDS = 8
KMERGES = 6


def py_words(text: str | None) -> list[str]:
    if not text:
        return []
    return [w for w in re.split(r"\s+", text.strip().lower()) if w]


def train_merges(word_freq: Counter, k: int) -> list[tuple[str, str]]:
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_freq.items()}
    merges = []
    for _ in range(k):
        stats: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        m = max(stats.values())
        best = min(p for p, c in stats.items() if c == m)
        merges.append(best)
        new_vocab: dict = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def encode_word(w: str, merges) -> list[str]:
    syms = list(w) + ["</w>"]
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
    ).fetchall()
    print(f"{len(docs)} docs", flush=True)

    # --- Python replay ---
    t0 = time.time()
    wf: Counter = Counter()
    doc_words = {}
    for did, text in docs:
        ws = py_words(text)
        doc_words[did] = ws
        wf.update(ws)
    merges = train_merges(wf, KMERGES)
    enc_cache = {w: encode_word(w, merges) for w in wf}
    per_doc = {}
    for did, ws in doc_words.items():
        toks = [s for w in ws for s in enc_cache[w]]
        per_doc[did] = (len(toks), hashlib.md5("-".join(toks).encode()).hexdigest())

    # BFD replay: shard by id, (size desc, id asc), tightest-fit-lowest-index
    assign = {}
    shards: dict[int, list] = {s: [] for s in range(N_SHARDS)}
    for did, (n_tok, _) in per_doc.items():
        shards[did % N_SHARDS].append((n_tok, did))
    for s, items in shards.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        avail: list[tuple[int, int]] = []
        n_bins = 0
        for n_tok, did in items:
            i = bisect_left(avail, (n_tok, -1))
            if i < len(avail):
                resid, j = avail.pop(i)
                insort(avail, (resid - n_tok, j))
            else:
                j = n_bins
                n_bins += 1
                insort(avail, (BUDGET - n_tok, j))
            assign[did] = (s, j)

    bins: dict[tuple[int, int], list] = {}
    for did, (n_tok, md5) in per_doc.items():
        h = int(hashlib.md5(f"0:{did}".encode()).hexdigest()[:15], 16)
        bins.setdefault(assign[did], []).append((h, did, n_tok, md5))
    expected = set()
    for (s, b), rows in bins.items():
        rows.sort()
        total = sum(r[2] for r in rows)
        digest = hashlib.md5("-".join(r[3] for r in rows).encode()).hexdigest()
        expected.add((s, b, len(rows), total, BUDGET - total, digest))
    print(f"python replay: {len(expected)} bins in {time.time()-t0:.1f}s", flush=True)

    # --- Spark side ---
    import __spark_entry__ as entrymod
    from seizury_hrv_featuresextraction_spark.session import get_spark

    spark = get_spark("verify-tokpipe")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    sdf = entrymod.queries()["tokenizer_pipeline"](spark, sf_dir).toPandas()
    wall = time.time() - t0
    got = {
        (int(r.shard), int(r.bin), int(r.n_docs), int(r.bin_tokens), int(r.headroom), r.order_md5)
        for r in sdf.itertuples(index=False)
    }
    print(f"spark side: {len(got)} bins in {wall:.1f}s", flush=True)
    missing = expected - got
    extra = got - expected
    if missing or extra:
        print(f"MISMATCH: missing={list(missing)[:3]} extra={list(extra)[:3]}")
        sys.exit(1)
    print(f"PASS tokenizer_pipeline sf1.0: {len(got)} bins bit-identical to the Python replay")


if __name__ == "__main__":
    main()
