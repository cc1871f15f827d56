"""1M-doc planted-truth probe for the span-level dedup suite
(dup_ngram_stats + duplicated_passages) — certifies the gram-keyed
exchange at ~19M gram rows with ASSERTED invariants.

Corpus: n_docs docs of 31 unique filler tokens each; every doc with
doc_id % 2 == 0 shares a 14-token sentence with its +1 neighbour,
embedded at token positions 9..22 (0-based 8..21). Planted truth per
paired doc: exactly 2 duplicated 13-grams (the shared sentence's two
windows), one merged span of 14 tokens at [9, 22]; unpaired docs have
none. (Doc pairs share ONLY that sentence; filler tokens are globally
unique per doc.)

Usage: python scripts/bench_dupgrams.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data

from duplicate_finder_ray.stages.textstats import (
    dup_ngram_stats,
    duplicated_passages,
)

SHARED = "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12 s13"  # 14 tokens


def make_docs(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    # noise is unique per doc; only SHARED is common across docs
    texts = []
    for i in ids:
        pre = " ".join(f"d{i}a{j}" for j in range(8))
        post = " ".join(f"d{i}b{j}" for j in range(9))
        texts.append(f"{pre} {SHARED} {post}")
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    # NOTE the shared sentence is common to ALL docs here, which makes
    # every doc's SHARED windows duplicated — the planted truth is the
    # same for every doc and the gram 's*' keys are the corpus-wide hot
    # keys (the skew case the exchange must survive).
    docs = ray.data.range(n_docs).map_batches(make_docs, batch_format="pyarrow")

    t0 = time.perf_counter()
    stats = dup_ngram_stats(docs, num_partitions=64)

    def check_stats(b: pa.Table) -> pa.Table:
        n = b.column("n_13grams").to_numpy()
        d = b.column("n_dup_13grams").to_numpy()
        # 31 tokens ⇒ 19 windows, all distinct; exactly 2 fall inside
        # the 14-token shared sentence (positions 9 and 10, 1-based)
        bad = int(((n != 19) | (d != 2)).sum())
        return pa.table({"bad": [bad], "rows": [len(n)]})

    agg = stats.map_batches(check_stats, batch_format="pyarrow").sum(
        ["bad", "rows"]
    )
    t_stats = time.perf_counter() - t0
    assert agg["sum(bad)"] == 0 and agg["sum(rows)"] == n_docs, agg

    t0 = time.perf_counter()
    spans = duplicated_passages(docs, num_partitions=64)

    def check_spans(b: pa.Table) -> pa.Table:
        s = b.column("start_tok").to_numpy()
        e = b.column("end_tok").to_numpy()
        bad = int(((s != 9) | (e != 22)).sum())
        return pa.table({"bad": [bad], "rows": [len(s)]})

    agg2 = spans.map_batches(check_spans, batch_format="pyarrow").sum(
        ["bad", "rows"]
    )
    t_spans = time.perf_counter() - t0
    assert agg2["sum(bad)"] == 0 and agg2["sum(rows)"] == n_docs, agg2

    print(json.dumps({
        "n_docs": n_docs,
        "gram_rows": n_docs * 19,
        "dup_ngram_stats_sec": round(t_stats, 2),
        "dup_ngram_docs_per_sec": int(n_docs / t_stats),
        "duplicated_passages_sec": round(t_spans, 2),
        "passages_docs_per_sec": int(n_docs / t_spans),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
