"""Scale probe for the sharded embedding-LSH verify (round-3 VERDICT
item 2): run ``lsh_cosine_pairs`` on >= 1 M synthetic vectors and
report wall time + recall vs the planted truth. The point being
evidenced: candidate generation AND verification complete with
per-task memory O(corpus / n_shards) — no task ever assembles the
whole corpus matrix (the round-2 design broadcast one normalized
float64 matrix, ~6 TB at 10^9 x 768-d).

Corpus: generated DISTRIBUTED and deterministically — every element is
a pure function of (vec_id, dim index) via hash -> Box-Muller, so
blocks synthesize independently at any parallelism (no driver-side
vector materialization, matching how the engine itself treats
corpora). ``n_planted`` near-duplicate pairs (cosine ~0.9988) sit in a
sea of independent vectors (cosine ~N(0, 1/8) at d=64, never near the
0.97 threshold at this corpus size).

LSH params are explicit (30 tables x 24 bits), not auto-derived: at
10^6 uniformly random vectors, 16-bit buckets (the auto ceiling) admit
~0.5^16 background collisions per table — 10^8 candidate pairs of pure
noise. 24-bit buckets keep background candidates ~10^6 while planted
detection stays ~1 (q = 0.984^24 = 0.68 per table, 30 tables).

Usage: python scripts/bench_embedding_lsh.py [n_vectors] [n_shards]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data

D = 64
N_PLANTED = 5_000
NOISE = 0.05
THRESHOLD = 0.97
N_TABLES = 30
N_BITS = 24


def _gauss(ids: np.ndarray, salt: int) -> np.ndarray:
    """(len(ids), D) standard normals, a pure function of (id, salt):
    counter hashes -> two uniforms -> Box-Muller. Vectorized C passes
    only."""
    with np.errstate(over="ignore"):
        base = (
            ids.astype(np.uint64)[:, None] * np.uint64(D)
            + np.arange(D, dtype=np.uint64)[None, :]
            + np.uint64(salt * 0x9E3779B97F4A7C15 & 0x7FFFFFFFFFFFFFFF)
        )
    h1 = pd.util.hash_array(base.ravel())
    h2 = pd.util.hash_array(h1)
    u1 = (h1 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u2 = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    z = np.sqrt(-2.0 * np.log1p(-u1)) * np.cos(2.0 * np.pi * u2)
    return z.reshape(len(ids), D)


def make_block(batch: pa.Table) -> pa.Table:
    vid = batch.column("id").to_numpy().astype(np.int64)
    # planted pairs are ROW-LOCAL: both members of pair i (rows 2i,
    # 2i+1) derive the even row's base vector, so planting survives any
    # block partitioning
    base_id = np.where(vid < 2 * N_PLANTED, (vid // 2) * 2, vid)
    vec = _gauss(base_id, salt=0)
    odd = (vid < 2 * N_PLANTED) & (vid % 2 == 1)
    if odd.any():
        vec[odd] += NOISE * _gauss(vid[odd], salt=1)
    return pa.table(
        {
            "vec_id": pa.array(vid, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vec.ravel(), pa.float64()), D
            ),
        }
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    from duplicate_finder_ray.stages.similarity import lsh_cosine_pairs

    ds = (
        ray.data.range(n, override_num_blocks=max(8, num_cpus * 2))
        .map_batches(make_block, batch_format="pyarrow")
        .materialize()
    )

    t0 = time.perf_counter()
    pairs = lsh_cosine_pairs(
        ds,
        threshold=THRESHOLD,
        n_tables=N_TABLES,
        n_bits=N_BITS,
        n_shards=n_shards,
    ).materialize()
    wall = time.perf_counter() - t0
    n_pairs = pairs.count()

    planted = set(
        (int(i), int(i + 1)) for i in np.arange(N_PLANTED, dtype=np.int64) * 2
    )
    got = set()
    for batch in pairs.iter_batches(batch_format="pyarrow"):
        for a, b in zip(
            batch.column("a").to_pylist(), batch.column("b").to_pylist()
        ):
            got.add((min(a, b), max(a, b)))
    recall = len(got & planted) / max(1, len(planted))

    print(
        json.dumps(
            {
                "metric": "embedding_lsh_pairs_scale_probe",
                "n_vectors": n,
                "dim": D,
                "n_shards": n_shards,
                "n_tables": N_TABLES,
                "n_bits": N_BITS,
                "threshold": THRESHOLD,
                "wall_sec": round(wall, 2),
                "vectors_per_sec": round(n / wall),
                "n_pairs": n_pairs,
                "n_planted": N_PLANTED,
                "recall_vs_planted": round(recall, 4),
                "num_cpus": num_cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
