"""Scale probe for IVF-PQ (stages/ivfpq.py) at >= 1 M vectors with
planted EXACT-duplicate pairs and asserted retrieval — not eyeballed.

Points evidenced at scale:

- index build is 1 + m streaming kmeans_lattice passes (k×d moment
  partials per block — the vector payload never shuffles during
  training) plus ONE slim id-keyed pivot exchange for the code table;
- search touches ONLY the code table (id, cell, m codes — 10 int64s
  per vector at m=8): per-block LUT gathers + local top-k, one tiny
  rank reduce.

Corpus: every vector is its OWN counter-hash Gaussian (no shared
cluster centers — shared centers make cluster-mates' residuals
quantize to the SAME codes and the resulting tie group swamps top-k,
the classic PQ resolution floor), except that every id with
id % 100 == 1 is a bit-identical copy of id − 1. Distinct vectors sit
~100× further apart than the PQ quantization error, so for a query q
(q % 100 == 0) the only code-identical candidate is its twin:
rank 1 = q, rank 2 = q+1 with EQUAL adc, rank 3 strictly farther —
all asserted per query.

Usage: python scripts/bench_ivfpq.py [n_vectors] — one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import ray
import ray.data

D = 256

CENTER_SCALE = 2.0



def _gauss(ids: np.ndarray, salt: int) -> np.ndarray:
    """(len(ids), D) standard normals, pure function of (id, salt) —
    the bench_semantic counter-hash generator, inlined so worker
    pickles never need the scripts dir on their path."""
    with np.errstate(over="ignore"):
        base = (
            ids.astype(np.uint64)[:, None] * np.uint64(2 * D)
            + np.arange(2 * D, dtype=np.uint64)[None, :]
            + np.uint64((salt * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF)
        )
        x = (base + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    u = (x.astype(np.float64) + 1.0) / 18446744073709551616.0
    u1, u2 = u[:, :D], u[:, D:]
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def make_vectors(n: int) -> ray.data.Dataset:
    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        # exact twins: id % 100 == 1 copies id - 1 bit for bit
        base_ids = np.where(ids % 100 == 1, ids - 1, ids)
        base_ids = np.maximum(base_ids, 0)
        vecs = _gauss(base_ids, salt=3) * CENTER_SCALE
        flat = pa.array(vecs.astype(np.float32).ravel(), pa.float32())
        offs = pa.array(np.arange(len(ids) + 1, dtype=np.int32) * D)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.ListArray.from_arrays(offs, flat),
            }
        )

    blocks = max(64, n // 25_000)
    return ray.data.range(n, override_num_blocks=blocks).map_batches(
        gen, batch_format="pyarrow"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from duplicate_finder_ray.stages.ivfpq import ivfpq_adc_topk

    vecs = make_vectors(n).materialize()  # probe the index, not the synth
    queries = [q for q in (0, n // 4 // 100 * 100, n // 2 // 100 * 100,
                           (3 * n // 4) // 100 * 100) if q + 1 < n]
    t0 = time.perf_counter()
    res = ivfpq_adc_topk(
        vecs, "vec_id", "embedding", dim=D, m=8, k_coarse=64, k_sub=64,
        query_ids=queries, topk=10, nprobe=8, iterations=2,
    ).to_pandas()
    wall = time.perf_counter() - t0

    for q in queries:
        sub = res[res["query_id"] == q].sort_values("rank")
        assert sub.iloc[0]["vec_id"] == q, (q, sub.head(3).to_dict())
        assert sub.iloc[1]["vec_id"] == q + 1, (q, sub.head(3).to_dict())
        assert sub.iloc[0]["adc_d2"] == sub.iloc[1]["adc_d2"]
        assert sub.iloc[2]["adc_d2"] > sub.iloc[1]["adc_d2"]

    print(
        json.dumps(
            {
                "probe": "ivfpq_adc_topk",
                "n_vectors": n,
                "dim": D,
                "m": 8,
                "k_coarse": 64,
                "k_sub": 64,
                "nprobe": 8,
                "build_plus_search_sec": round(wall, 2),
                "vectors_per_sec": round(n / wall, 1),
                "n_queries": len(queries),
                "planted_twins_at_rank2_exact": True,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
