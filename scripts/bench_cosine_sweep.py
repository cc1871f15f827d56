"""Scale probe for the cosine threshold sweep (round-4 VERDICT "what's
wrong" #1): run ``cosine_threshold_sweep`` on >= 1 M synthetic vectors
and evidence that the sweep completes WITHOUT the O(n²) corpus pass —
the AUTO stage must take its deterministic-sample branch above
``brute_rows`` vectors, score only the ~sample_rows² sampled slice, and
return an unbiased (n/s)²-scaled count estimate.

Corpus: same distributed deterministic scheme as
scripts/bench_embedding_lsh.py — every element is a pure function of
(vec_id, dim) via hash -> Box-Muller, planted near-dup pairs
(cosine ~0.9988) on row-local id pairs in a sea of independent
vectors. At d=64 the background cosine is ~N(0, 1/64), so the planted
signal is the ONLY mass above τ = 0.8 (6.4σ) while τ = 0.3 (2.4σ)
collects a predictable ~0.87% background tail — the probe asserts the
planted-count estimate at 0.8 lands within the sampling-noise window
and that counts decrease monotonically in τ.

Usage: python scripts/bench_cosine_sweep.py [n_vectors]
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
N_PLANTED = 25_000
NOISE = 0.05


def _gauss(ids: np.ndarray, salt: int) -> np.ndarray:
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
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    from duplicate_finder_ray.stages.similarity import cosine_threshold_sweep

    ds = (
        ray.data.range(n, override_num_blocks=max(8, num_cpus * 2))
        .map_batches(make_block, batch_format="pyarrow")
        .materialize()
    )

    thresholds = np.arange(300_000, 800_001, 50_000, dtype=np.int64)
    t0 = time.perf_counter()
    sweep = {
        r["threshold_ppm"]: r["n_pairs"]
        for r in cosine_threshold_sweep(
            ds, thresholds, threshold_min=0.3
        ).take_all()
    }
    wall = time.perf_counter() - t0

    counts = [sweep.get(int(t), 0) for t in thresholds]
    # monotone non-increasing in τ
    assert all(
        counts[i] >= counts[i + 1] for i in range(len(counts) - 1)
    ), counts
    # planted signal at τ=0.8: 25k true pairs, sample f=s/n ⇒ the
    # estimate is Poisson(25k·f²)/f² — assert the ±3σ-ish window
    est_08 = sweep.get(800_000, 0)
    assert 8_000 <= est_08 <= 45_000, est_08
    out = {
        "probe": "cosine_threshold_sweep_1M",
        "n_vectors": n,
        "wall_sec": round(wall, 2),
        "est_pairs_at_0.8": int(est_08),
        "est_pairs_at_0.3": int(sweep.get(300_000, 0)),
        "planted_pairs": N_PLANTED,
        "num_cpus": num_cpus,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
