"""Integer-lattice Lloyd k-means vs a plain-Python oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _trunc_div(s: np.ndarray, n: int) -> np.ndarray:
    return np.sign(s) * (np.abs(s) // n)


def _oracle(df: pd.DataFrame, k: int, iterations: int):
    """Sequential Lloyd on the micro-lattice, trunc-division update,
    smallest-id seeds, tie to smaller cluster id."""
    ids = df["vec_id"].to_numpy()
    q = np.floor(
        np.array([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        * 1_000_000
        + 0.5
    ).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    seeds = order[:k]
    groups = list(range(len(seeds)))
    cent = {g: q[seeds[g]] for g in groups}

    def assign():
        out = {}
        for i, vid in enumerate(ids):
            best = min(
                groups, key=lambda g: (int(((q[i] - cent[g]) ** 2).sum()), g)
            )
            out[vid] = (best, int(((q[i] - cent[best]) ** 2).sum()))
        return out

    for _ in range(iterations):
        a = assign()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for i, vid in enumerate(ids):
            g = a[vid][0]
            sums[g] = sums.get(g, 0) + q[i]
            counts[g] = counts.get(g, 0) + 1
        groups = sorted(sums)
        cent = {g: _trunc_div(sums[g], counts[g]) for g in groups}
    return assign()


def _corpus(n=60, d=6, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, d)) * 2
    vecs = [
        centers[i % 3] + rng.normal(scale=0.3, size=d) for i in range(n)
    ]
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64) * 7 + 3,  # non-contiguous
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
        }
    )


@pytest.mark.parametrize("iterations", [0, 1, 3])
def test_kmeans_matches_oracle(ray_session, iterations):
    import ray.data

    from duplicate_finder_ray.stages.kmeans import kmeans_lattice

    df = _corpus()
    got = (
        kmeans_lattice(
            ray.data.from_pandas(df).repartition(4),
            "vec_id", "embedding", k=5, iterations=iterations,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = _oracle(df, 5, iterations)
    assert len(got) == len(df)
    for _, row in got.iterrows():
        cl, d2 = want[row["vec_id"]]
        assert row["cluster"] == cl
        assert row["d2"] == d2


def test_kmeans_parallelism_invariant(ray_session):
    import ray.data

    from duplicate_finder_ray.stages.kmeans import kmeans_lattice

    df = _corpus(n=80, seed=5)
    outs = []
    for parts in (1, 7):
        got = (
            kmeans_lattice(
                ray.data.from_pandas(df).repartition(parts),
                "vec_id", "embedding", k=4, iterations=2,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_kmeans_k_exceeds_rows(ray_session):
    import ray.data

    from duplicate_finder_ray.stages.kmeans import kmeans_lattice

    df = _corpus(n=3)
    got = kmeans_lattice(
        ray.data.from_pandas(df), "vec_id", "embedding", k=10, iterations=1
    ).to_pandas()
    assert len(got) == 3
    # every vector sits exactly on its own seed centroid
    assert (got["d2"] == 0).all()


def test_kmeans_rejects_bad_params(ray_session):
    import ray.data

    from duplicate_finder_ray.stages.kmeans import kmeans_lattice

    ds = ray.data.from_pandas(_corpus(n=4))
    with pytest.raises(ValueError):
        kmeans_lattice(ds, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError):
        kmeans_lattice(ds, "vec_id", "embedding", k=2, iterations=-1)
