"""Scale probe for the semantic family: integer-lattice Lloyd k-means
and SemDeDup at >= 1 M synthetic vectors.

Points evidenced at scale:

- `kmeans_lattice`: each iteration is ONE streaming pass over the
  vectors emitting k×d int64 moment partials per block plus one tiny
  reduce — vectors never shuffle, driver state is k×d ints;
- `semdedup`: the embedding payload crosses exactly one cluster-keyed
  exchange; within-cluster duplicate search is exact and
  partition-local (k bounds the per-partition quadratic).

Corpus: deterministic and distributed — each vector is a planted
cluster center (vec_id % n_centers) plus counter-hash Gaussian noise;
every 200th vector is a NEAR-COPY of its predecessor (tiny noise), so
SemDeDup must find exactly those planted duplicate pairs at the probe
threshold. Exactness is asserted, not eyeballed.

Usage: python scripts/bench_semantic.py [n_vectors] [k]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data

D = 256  # z-margin between cluster-mates and the threshold scales as sqrt(D/2)
DUP_EVERY = 200
CENTER_SCALE = 2.0
NOISE = 0.25
DUP_NOISE = 0.002
THRESHOLD = 0.995


def _gauss(ids: np.ndarray, salt: int) -> np.ndarray:
    """(len(ids), D) standard normals, pure function of (id, salt)."""
    with np.errstate(over="ignore"):
        base = (
            ids.astype(np.uint64)[:, None] * np.uint64(2 * D)
            + np.arange(2 * D, dtype=np.uint64)[None, :]
            + np.uint64((salt * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF)
        )
        x = (base + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(
            0xBF58476D1CE4E5B9
        )
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    u = (x.astype(np.float64) + 1.0) / 18446744073709551616.0
    u1, u2 = u[:, :D], u[:, D:]
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def make_vectors(n: int, n_centers: int) -> ray.data.Dataset:
    """labels = planted center index — SemDeDup groups on them."""
    centers = _gauss(np.arange(n_centers, dtype=np.int64), salt=99) * CENTER_SCALE

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        # near-dup rows copy their predecessor's base vector
        base_ids = np.where(ids % DUP_EVERY == 0, ids - 1, ids)
        base_ids = np.maximum(base_ids, 0)
        cl = (base_ids % n_centers).astype(np.int64)
        noise = _gauss(base_ids, salt=1) * NOISE
        vecs = centers[cl] + noise
        dup = (ids % DUP_EVERY == 0) & (ids > 0)
        if dup.any():
            vecs[dup] += _gauss(ids[dup], salt=2) * DUP_NOISE
        flat = pa.array(vecs.astype(np.float32).ravel(), pa.float32())
        offs = pa.array(np.arange(len(ids) + 1, dtype=np.int32) * D)
        emb = pa.ListArray.from_arrays(offs, flat)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "label": pa.array(cl.astype(np.int32), pa.int32()),
                "embedding": emb,
            }
        )

    blocks = max(64, n // 25_000)
    return ray.data.range(n, override_num_blocks=blocks).map_batches(
        gen, batch_format="pyarrow"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64  # k-means centroids
    n_groups = 2048  # SemDeDup cluster count — bounds the per-cluster quadratic
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

    from duplicate_finder_ray.stages.kmeans import kmeans_lattice
    from duplicate_finder_ray.stages.semdedup import semdedup
    from duplicate_finder_ray.stages.stats import grouped_vector_mean

    vecs = make_vectors(n, n_groups).materialize()  # synthesis excluded from timing

    t0 = time.perf_counter()
    assigned = kmeans_lattice(
        vecs, "vec_id", "embedding", k=k, iterations=2
    ).materialize()
    kmeans_wall = time.perf_counter() - t0
    n_assigned = assigned.count()

    t0 = time.perf_counter()
    cents = grouped_vector_mean(
        vecs.select_columns(["label", "embedding"]), "label", "embedding"
    ).materialize()
    cents_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    dups = semdedup(
        vecs,
        "vec_id",
        "embedding",
        cents,
        threshold=THRESHOLD,
        num_partitions=max(16, num_cpus),
    ).materialize()
    sem_wall = time.perf_counter() - t0

    n_dup_rows = dups.count()
    kept = dups.to_pandas()
    n_found_groups = kept["component"].nunique() if len(kept) else 0
    n_planted = (n - 1) // DUP_EVERY  # ids DUP_EVERY, 2·DUP_EVERY, ...
    result = {
        "probe": "semantic (kmeans_lattice + semdedup)",
        "n_vectors": n,
        "k": k,
        "num_cpus": num_cpus,
        "kmeans_wall_sec": round(kmeans_wall, 2),
        "kmeans_vecs_per_sec": round(n / kmeans_wall, 1),
        "kmeans_rows": n_assigned,
        "centroids_wall_sec": round(cents_wall, 2),
        "semdedup_wall_sec": round(sem_wall, 2),
        "semdedup_vecs_per_sec": round(n / sem_wall, 1),
        "semdedup_clusters": n_groups,
        "dup_rows": n_dup_rows,
        "dup_groups": n_found_groups,
        "planted_pairs": n_planted,
        "exact": bool(
            n_assigned == n
            and n_found_groups == n_planted
            and n_dup_rows == 2 * n_planted
            and (kept.groupby("component")["keep"].sum() == 1).all()
        ),
    }
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
