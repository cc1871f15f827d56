"""Mergeable quantile sketch (merging t-digest) — the scale path next
to the exact ``stages/relational.py:grouped_quantiles`` oracle.

The exact per-group quantile holds EVERY value of a group in one task
(``groupby(lang).map_groups``) — O(rows-per-group) memory, unbounded at
corpus scale (round-2 VERDICT item 3). This module follows the same
partial/merge pattern as the HLL cardinality sketch
(stages/textstats.py:hll_partial): per-batch partials of bounded size
(<= ~delta/2 centroids), an associative weighted merge, and a tiny
driver/reduce finalize — so the widest thing that ever crosses the
shuffle is groups x delta centroids, never values.

Sketch: Dunning's merging t-digest with the k1 scale function
k(q) = (delta / 2*pi) * asin(2q - 1). Buckets are narrow near q=0/1 and
wide at the median, giving relative-rank error ~O(1/delta) at the tails
and ~O(4/delta) at the middle. All compression is vectorized (argsort +
reduceat over bucket boundaries) — no per-value Python.

Accuracy is gated in tests/test_sketches.py against exact
np.quantile on adversarial (lognormal / constant / tiny) inputs, and
``grouped_quantiles_sketch`` is gated against the exact
``grouped_quantiles`` oracle at a tested rank-error bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from duplicate_finder_ray.functions.hashing import stable_hash_array


def tdigest_compress(
    means: np.ndarray, weights: np.ndarray, delta: int = 500
) -> tuple[np.ndarray, np.ndarray]:
    """Compress weighted points (or centroids) to <= ~delta/2 + 2
    centroids, sorted by mean. Associative enough for partial/merge use:
    merging compressed digests and re-compressing preserves the k1
    bucket-width invariant. Fully vectorized."""
    if len(means) == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="mergesort")
    m = means[order].astype(np.float64)
    w = weights[order].astype(np.float64)
    total = w.sum()
    # midpoint rank of each centroid -> k1 bucket id
    q = (np.cumsum(w) - w / 2.0) / total
    k = (delta / (2.0 * np.pi)) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))
    grp = np.floor(k).astype(np.int64)
    change = np.empty(len(grp), dtype=bool)
    change[0] = True
    change[1:] = grp[1:] != grp[:-1]
    starts = np.nonzero(change)[0]
    wsum = np.add.reduceat(w, starts)
    msum = np.add.reduceat(m * w, starts)
    return msum / wsum, wsum


def tdigest_partial(
    values: np.ndarray, delta: int = 500
) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch combiner: values -> bounded centroid arrays."""
    v = np.asarray(values, dtype=np.float64)
    return tdigest_compress(v, np.ones(len(v), dtype=np.float64), delta)


def tdigest_merge(
    parts: list[tuple[np.ndarray, np.ndarray]], delta: int = 500
) -> tuple[np.ndarray, np.ndarray]:
    """Associative merge: concatenate centroid lists, one re-compress."""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    means = np.concatenate([p[0] for p in parts])
    weights = np.concatenate([p[1] for p in parts])
    return tdigest_compress(means, weights, delta)


def tdigest_quantile(
    means: np.ndarray, weights: np.ndarray, qs: np.ndarray | list[float]
) -> np.ndarray:
    """Quantile estimates by linear interpolation between centroid
    midpoint ranks (clamped to [min-centroid, max-centroid] means)."""
    qs = np.asarray(qs, dtype=np.float64)
    if len(means) == 0:
        return np.full(len(qs), np.nan)
    if np.all(weights == 1.0):
        # EXACT branch: no compaction has merged anything, so the
        # centroids ARE the values and the sketch answers with the
        # exact linear-interpolation quantile — bit-identical to the
        # ``relational.grouped_quantiles`` oracle. The k1 scale
        # function guarantees this holds whenever a group has
        # ≤ delta/pi values (midpoint ranks then differ by > 1 in
        # k-space, so no two points share a bucket) — which is why
        # the driver's exact-quantile SQL is a true hash-match oracle
        # at gate scales while the sketch stays mergeable and bounded
        # at corpus scale.
        return np.quantile(means, qs, method="linear")
    total = weights.sum()
    cum = np.cumsum(weights) - weights / 2.0
    return np.interp(qs * total, cum, means)


def grouped_quantiles_sketch(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: list[tuple[str, float]],
    delta: int = 500,
    num_partitions: int = 16,
    unit_scale: int = 100,
) -> ray.data.Dataset:
    """Sketch twin of ``relational.grouped_quantiles`` (same output
    schema: int fixed-point units, floor(q*unit_scale + 0.5) — centi by
    default). Execution shape:

    1. per-batch partial: one t-digest per (batch, group), serialized as
       two float64 byte blobs — bounded size regardless of group skew;
    2. barrier-free hash exchange on the group key;
    3. per-partition merge + finalize — the reduce sees
       O(batches x delta) centroids per group, never values.

    A group 100x bigger than worker memory streams through unchanged —
    the property the exact oracle lacks."""
    names = [n for n, _ in qs]
    fracs = np.array([f for _, f in qs], dtype=np.float64)
    out_schema = pa.schema(
        [(group_col, pa.string())] + [(n, pa.int64()) for n in names]
    )
    part_schema = pa.schema(
        [
            (group_col, pa.string()),
            ("means", pa.large_binary()),
            ("weights", pa.large_binary()),
        ]
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        rows_g, rows_m, rows_w = [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            m, w = tdigest_partial(sub[value_col].to_numpy(), delta)
            rows_g.append(str(g))
            rows_m.append(m.tobytes())
            rows_w.append(w.tobytes())
        return pa.table(
            {
                group_col: pa.array(rows_g, pa.string()),
                "means": pa.array(rows_m, pa.large_binary()),
                "weights": pa.array(rows_w, pa.large_binary()),
            },
            schema=part_schema,
        )

    def group_part(tbl: pa.Table, n: int) -> np.ndarray:
        g = tbl.column(group_col).to_numpy(zero_copy_only=False).astype(object)
        return (stable_hash_array(g) % np.uint64(n)).astype(np.int64)

    def finalize(p: int, tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        out: dict[str, list] = {group_col: []}
        for n in names:
            out[n] = []
        for g, sub in df.groupby(group_col, sort=False):
            parts = [
                (
                    np.frombuffer(m, dtype=np.float64),
                    np.frombuffer(w, dtype=np.float64),
                )
                for m, w in zip(sub["means"], sub["weights"])
            ]
            means, weights = tdigest_merge(parts, delta)
            vals = tdigest_quantile(means, weights, fracs)
            out[group_col].append(str(g))
            for n, v in zip(names, vals):
                out[n].append(int(np.floor(v * unit_scale + 0.5)))
        return pa.Table.from_pydict(out, schema=out_schema)

    from duplicate_finder_ray.stages.exchange import hash_exchange

    partials = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pandas"
    )
    return hash_exchange(
        partials, group_part, num_partitions, finalize, out_schema.empty_table()
    )
