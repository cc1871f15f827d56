"""SemDeDup composition vs a brute-force Python oracle on synthetic
clustered vectors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _make_corpus():
    """Three tight clusters + noise. Within-cluster near-identical
    vectors must form duplicate groups; the farthest-from-centroid
    member must win."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(3, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, labels = [], []
    for c in range(3):
        for j in range(6):
            v = base[c] + rng.normal(scale=0.01 if j < 4 else 0.8, size=16)
            vecs.append(v)
            labels.append(c)
    return pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "label": np.array(labels, dtype=np.int32),
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
        }
    )


def _oracle(df: pd.DataFrame, tau: float):
    """Exact SemDeDup in plain numpy: lattice assignment, within-cluster
    cosine edges, CC, keep = max d2 then smallest id."""
    q = np.floor(
        np.array([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        * 1_000_000
        + 0.5
    ).astype(np.int64)
    labels = sorted(df["label"].unique())
    cents = {}
    for g in labels:
        s = q[df["label"].to_numpy() == g].sum(axis=0)
        n = int((df["label"] == g).sum())
        # SQL's // truncates toward zero (the engine mirrors it);
        # numpy's // floors — they differ on negative sums
        cents[g] = np.sign(s) * (np.abs(s) // n)
    assign, d2s = {}, {}
    for i, vid in enumerate(df["vec_id"]):
        dists = {g: int(((q[i] - cents[g]) ** 2).sum()) for g in labels}
        g = min(labels, key=lambda x: (dists[x], x))
        assign[vid] = g
        d2s[vid] = dists[g]
    m = np.array([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    parent = {int(v): int(v) for v in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    in_pair = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = int(ids[i]), int(ids[j])
            if assign[a] != assign[b]:
                continue
            if float(m[i] @ m[j]) >= tau:
                ra, rb = find(a), find(b)
                parent[max(ra, rb)] = min(ra, rb)
                in_pair.update((a, b))
    comp = {v: find(v) for v in in_pair}
    out = {}
    for group in set(comp.values()):
        members = sorted(v for v in in_pair if comp[v] == group)
        keeper = max(members, key=lambda v: (d2s[v], -v))
        for v in members:
            out[v] = (assign[v], group, d2s[v], 1 if v == keeper else 0)
    return out


@pytest.mark.parametrize("tau", [0.9, 0.99])
def test_semdedup_matches_oracle(ray_session, tau):
    import ray.data

    from duplicate_finder_ray.stages.semdedup import semdedup
    from duplicate_finder_ray.stages.stats import grouped_vector_mean

    df = _make_corpus()
    emb = ray.data.from_pandas(df).repartition(3)
    cents = grouped_vector_mean(
        emb.select_columns(["label", "embedding"]), "label", "embedding"
    )
    got = (
        semdedup(emb, "vec_id", "embedding", cents, threshold=tau,
                 num_partitions=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = _oracle(df, tau)
    assert list(got["vec_id"]) == sorted(want)
    for _, row in got.iterrows():
        cluster, component, d2, keep = want[row["vec_id"]]
        assert row["cluster"] == cluster
        assert row["component"] == component
        assert row["d2"] == d2
        assert row["keep"] == keep
    # each duplicate group keeps exactly one member
    if len(got):
        assert (got.groupby("component")["keep"].sum() == 1).all()


def test_semdedup_no_pairs_yields_empty(ray_session):
    import ray.data

    from duplicate_finder_ray.stages.semdedup import semdedup
    from duplicate_finder_ray.stages.stats import grouped_vector_mean

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(8, dtype=np.int64),
            "label": np.array([0, 0, 1, 1, 2, 2, 3, 3], dtype=np.int32),
            "embedding": [rng.normal(size=8).tolist() for _ in range(8)],
        }
    )
    emb = ray.data.from_pandas(df)
    cents = grouped_vector_mean(
        emb.select_columns(["label", "embedding"]), "label", "embedding"
    )
    got = semdedup(emb, "vec_id", "embedding", cents, threshold=0.9999)
    assert got.count() == 0
    assert set(got.schema().names) == {
        "vec_id", "cluster", "component", "d2", "keep"
    }


def test_semdedup_rejects_bad_params(ray_session):
    import ray.data

    from duplicate_finder_ray.stages.semdedup import semdedup

    ds = ray.data.from_pandas(_make_corpus())
    with pytest.raises(ValueError):
        semdedup(ds, "vec_id", "embedding", ds, threshold=0.0)
    with pytest.raises(ValueError):
        semdedup(ds, "vec_id", "embedding", ds, threshold=0.5,
                 num_partitions=0)
