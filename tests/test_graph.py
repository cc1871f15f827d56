"""Graph analytics over pair sets (stages/graph.py): degrees, degree
histogram, exact triangle count — checked against tiny hand-counted
graphs and a random-graph brute-force oracle."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from duplicate_finder_ray.stages.graph import (
    degree_histogram,
    pair_degrees,
    triangle_count,
)


def _edges_ds(pairs: list[tuple[str, str]]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs]),
                "b": pa.array([p[1] for p in pairs]),
            }
        )
    ).repartition(3)


def _brute_triangles(pairs: list[tuple[str, str]]) -> int:
    es = {frozenset(p) for p in pairs}
    nodes = sorted({n for p in pairs for n in p})
    return sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if {x, y} in es and {y, z} in es and {x, z} in es
    )


def test_pair_degrees_triangle_plus_tail():
    # triangle a-b-c plus pendant edge c-d
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    deg = pair_degrees(_edges_ds(pairs)).to_pandas()
    got = dict(zip(deg["node"], deg["degree"]))
    assert got == {"a": 2, "b": 2, "c": 3, "d": 1}

    hist = degree_histogram(_edges_ds(pairs)).to_pandas()
    got_h = dict(zip(hist["degree"], hist["n_nodes"]))
    assert got_h == {1: 1, 2: 2, 3: 1}

    tri = triangle_count(_edges_ds(pairs)).to_pandas()
    assert tri["n_triangles"].tolist() == [1]


def test_triangle_count_k4():
    # complete graph on 4 nodes: C(4,3) = 4 triangles
    nodes = ["w", "x", "y", "z"]
    pairs = list(itertools.combinations(nodes, 2))
    tri = triangle_count(_edges_ds(pairs)).to_pandas()
    assert tri["n_triangles"].tolist() == [4]


def test_triangle_count_no_triangles():
    # path graph has zero triangles
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    tri = triangle_count(_edges_ds(pairs)).to_pandas()
    assert tri["n_triangles"].tolist() == [0]


def test_triangle_count_random_vs_bruteforce():
    rng = np.random.default_rng(7)
    nodes = [f"n{i:03d}" for i in range(40)]
    all_pairs = list(itertools.combinations(nodes, 2))
    idx = rng.choice(len(all_pairs), size=200, replace=False)
    pairs = [all_pairs[i] for i in sorted(idx)]
    want = _brute_triangles(pairs)
    assert want > 0  # dense enough to be a real check
    tri = triangle_count(_edges_ds(pairs), num_partitions=5).to_pandas()
    assert tri["n_triangles"].tolist() == [want]


def test_degrees_vs_pandas_oracle():
    rng = np.random.default_rng(11)
    nodes = [f"d{i}" for i in range(60)]
    all_pairs = list(itertools.combinations(nodes, 2))
    idx = rng.choice(len(all_pairs), size=300, replace=False)
    pairs = [all_pairs[i] for i in sorted(idx)]
    deg = pair_degrees(_edges_ds(pairs)).to_pandas()
    ends = pd.Series([n for p in pairs for n in p])
    want = ends.value_counts().sort_index()
    got = deg.set_index("node")["degree"].sort_index()
    assert (got == want).all() and len(got) == len(want)


def _np_pagerank_int(
    pairs: list[tuple[str, str]],
    iterations: int = 3,
    dn: int = 17,
    dd: int = 20,
    scale: int = 10**12,
) -> dict[str, int]:
    """Single-process integer-lattice PageRank — the op-for-op oracle."""
    nodes = sorted({n for p in pairs for n in p})
    deg = {n: 0 for n in nodes}
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    tele = (scale - (scale * dn) // dd) // n
    for _ in range(iterations):
        c = {v: 0 for v in nodes}
        for a, b in pairs:
            c[b] += r[a] // deg[a]
            c[a] += r[b] // deg[b]
        r = {v: tele + (dn * c[v]) // dd for v in nodes}
    return r


def test_pagerank_matches_integer_oracle():
    from duplicate_finder_ray.stages.graph import pagerank

    # star a-{b,c,d} plus pendant chain d-e: hub 'a' must outrank leaves
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("d", "e")]
    got = pagerank(_edges_ds(pairs), iterations=3).to_pandas()
    want = _np_pagerank_int(pairs, iterations=3)
    assert dict(zip(got["node"], got["rank"])) == want
    ranks = dict(zip(got["node"], got["rank"]))
    assert ranks["a"] == max(ranks.values())


def test_pagerank_partitioning_invariant():
    from duplicate_finder_ray.stages.graph import pagerank

    rng = np.random.default_rng(5)
    nodes = [f"p{i}" for i in range(50)]
    all_pairs = list(itertools.combinations(nodes, 2))
    idx = rng.choice(len(all_pairs), size=150, replace=False)
    pairs = [all_pairs[i] for i in sorted(idx)]
    want = _np_pagerank_int(pairs)
    for reparts in (1, 7):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([p[0] for p in pairs]),
                    "b": pa.array([p[1] for p in pairs]),
                }
            )
        ).repartition(reparts)
        got = pagerank(ds, num_partitions=4 if reparts == 7 else None).to_pandas()
        assert dict(zip(got["node"], got["rank"])) == want
    # integer flooring only ever loses mass: total ≤ scale, close to it
    total = sum(want.values())
    assert 0.99 * 10**12 < total <= 10**12


def _kcore_oracle(pairs: list[tuple], k: int, rounds: int) -> dict:
    edges = list(pairs)
    for _ in range(rounds):
        deg: dict = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        edges = [(a, b) for a, b in edges if a in keep and b in keep]
    out: dict = {}
    for a, b in edges:
        out[a] = out.get(a, 0) + 1
        out[b] = out.get(b, 0) + 1
    return out


def test_kcore_peel_matches_python_oracle():
    from duplicate_finder_ray.stages.graph import kcore_peel

    # a 5-clique (survives any 3-core peel), a 6-chain (dies), and a
    # pendant hanging off the clique (dies round 1, lowering c0's
    # degree — exercises the iterative re-peel)
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    chain = [(f"h{i}", f"h{i+1}") for i in range(6)]
    pend = [("c0", "p0")]
    pairs = clique + chain + pend
    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs]),
                "b": pa.array([p[1] for p in pairs]),
            }
        )
    ).repartition(3)
    got = {
        r["node"]: r["degree"]
        for r in kcore_peel(ds, k=3, rounds=3, n_parts=4).take_all()
    }
    want = _kcore_oracle(pairs, 3, 3)
    assert got == want
    assert set(got) == {f"c{i}" for i in range(5)}  # only the clique survives


def test_kcore_rejects_bad_params():
    import pytest as _pytest

    from duplicate_finder_ray.stages.graph import kcore_peel

    ds = ray.data.from_arrow(pa.table({"a": ["x"], "b": ["y"]}))
    with _pytest.raises(ValueError):
        kcore_peel(ds, k=0, rounds=1)
    with _pytest.raises(ValueError):
        kcore_peel(ds, k=1, rounds=0)


def test_cluster_density_clique_vs_chain():
    from duplicate_finder_ray.stages.graph import cluster_density

    # triangle {x,y,z}: 3 edges over 3 nodes -> density 1.0 (clique);
    # chain p-q-r-s: 3 edges over 4 nodes -> 2*3e6 // 12 = 500000
    pairs = _edges_ds(
        [("x", "y"), ("x", "z"), ("y", "z"), ("p", "q"), ("q", "r"), ("r", "s")]
    )
    labels = ray.data.from_arrow(
        pa.table(
            {
                "file_id": pa.array(["x", "y", "z", "p", "q", "r", "s"]),
                "component": pa.array(["x", "x", "x", "p", "p", "p", "p"]),
            }
        )
    ).repartition(2)
    out = {r["component"]: r for r in cluster_density(pairs, labels, n_parts=4).take_all()}
    assert out["x"]["n_nodes"] == 3 and out["x"]["n_edges"] == 3
    assert out["x"]["density_ppm"] == 1_000_000
    assert out["p"]["n_nodes"] == 4 and out["p"]["n_edges"] == 3
    assert out["p"]["density_ppm"] == 500_000


def test_cluster_density_end_to_end_with_cc():
    from duplicate_finder_ray.config import PipelineConfig
    from duplicate_finder_ray.stages.cc import connected_components
    from duplicate_finder_ray.stages.graph import cluster_density

    pairs = _edges_ds([("a", "b"), ("b", "c"), ("d", "e")])
    labels = connected_components(pairs, PipelineConfig())
    out = {r["component"]: r for r in cluster_density(pairs, labels).take_all()}
    assert out["a"]["n_nodes"] == 3 and out["a"]["n_edges"] == 2
    assert out["a"]["density_ppm"] == 2 * 2_000_000 // 6
    assert out["d"]["n_nodes"] == 2 and out["d"]["n_edges"] == 1
    assert out["d"]["density_ppm"] == 1_000_000
