"""Scale probe for paragraph-level exact dedup: run
``paragraph_dedup`` on >= 1 M synthetic documents with PLANTED
corpus-wide boilerplate and report wall time + exact removal counts.

The points being evidenced at scale:

- the identity pass ships only 24-byte md5-128 window keys (8 windows
  per 120-token doc here, so slim-key traffic is ~"rows × 8 × 24 B",
  never text);
- the document text crosses exactly ONE exchange (reassembly), where
  each partition re-chunks locally;
- a corpus-hot window (the planted boilerplate appears in 10 % of all
  documents) concentrates only its slim keys, so the hot partition
  holds O(copies × 24 B).

Corpus: generated DISTRIBUTED and deterministically — token ids are a
pure function of (doc_id, position) via counter hashing, so blocks
synthesize independently at any parallelism. Every 10th document's
first 32 tokens are the SAME boilerplate block (= 2 duplicated
16-token windows per such doc); all other windows are unique with
overwhelming probability (119-bit random token streams).

Expected exact counts (checked, not eyeballed):
- every document survives (each keeps >= 6 unique windows);
- total windows = 8 × n_docs; kept = total − (n_boiler − 1) × 2.

Usage: python scripts/bench_paragraph_dedup.py [n_docs] [n_partitions]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data

DOC_TOKENS = 120
WINDOW = 16
VOCAB = 4096
BOILER_EVERY = 10
BOILER_TOKENS = 32  # = 2 whole windows


def _token_ids(ids: np.ndarray) -> np.ndarray:
    """(len(ids), DOC_TOKENS) vocab indices, a pure function of
    (doc_id, position) — vectorized splitmix-style counter hash."""
    with np.errstate(over="ignore"):
        x = (
            ids.astype(np.uint64)[:, None] * np.uint64(DOC_TOKENS)
            + np.arange(DOC_TOKENS, dtype=np.uint64)[None, :]
        )
        x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(
            0xBF58476D1CE4E5B9
        )
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return (x % np.uint64(VOCAB)).astype(np.int64)


def make_docs(n_docs: int) -> ray.data.Dataset:
    vocab = pa.array([f"w{i:04d}" for i in range(VOCAB)], pa.string())
    boiler = np.arange(BOILER_TOKENS, dtype=np.int64) * 7 % VOCAB

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        toks = _token_ids(ids)
        is_boiler = ids % BOILER_EVERY == 0
        toks[is_boiler, :BOILER_TOKENS] = boiler
        flat = pa.array(toks.ravel(), pa.int64())
        words = vocab.take(flat)
        offs = pa.array(
            np.arange(len(ids) + 1, dtype=np.int64) * DOC_TOKENS
        )
        text = pc.binary_join(
            pa.LargeListArray.from_arrays(offs, words), " "
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pc.cast(text, pa.string()),
            }
        )

    blocks = max(64, n_docs // 50_000)
    return ray.data.range(n_docs, override_num_blocks=blocks).map_batches(
        gen, batch_format="pyarrow"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from duplicate_finder_ray.stages.paradedup import paragraph_dedup

    docs = make_docs(n_docs).materialize()  # exclude synthesis from timing
    t0 = time.perf_counter()
    out = paragraph_dedup(
        docs, "doc_id", "text", window_tokens=WINDOW, num_partitions=n_parts
    ).materialize()
    wall = time.perf_counter() - t0

    n_out = out.count()
    from ray.data.aggregate import Sum

    sums = out.aggregate(Sum("n_chunks"), Sum("n_kept"))
    total_windows = int(sums["sum(n_chunks)"])
    kept_windows = int(sums["sum(n_kept)"])
    n_boiler = (n_docs + BOILER_EVERY - 1) // BOILER_EVERY
    expect_total = 8 * n_docs
    expect_kept = expect_total - (n_boiler - 1) * 2
    result = {
        "probe": "paragraph_dedup",
        "n_docs": n_docs,
        "n_partitions": n_parts,
        "num_cpus": num_cpus,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "docs_out": n_out,
        "windows_total": total_windows,
        "windows_kept": kept_windows,
        "expected_total": expect_total,
        "expected_kept": expect_kept,
        "exact": bool(
            n_out == n_docs
            and total_windows == expect_total
            and kept_windows == expect_kept
        ),
    }
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
