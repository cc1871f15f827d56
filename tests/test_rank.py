"""Unit tests for stages/rank.py — exact global row_number and
sorted-neighborhood candidate pairs, checked against numpy/brute-force
oracles across block layouts, boundary degeneracies and window edges."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from duplicate_finder_ray.stages import rank as rk


def _ds(d: dict) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table(d))


def _expected_ranks(keys: list[tuple]) -> dict[tuple, int]:
    return {k: i for i, k in enumerate(sorted(keys))}


class TestGlobalRank:
    def test_matches_sorted_order_multiblock(self):
        rng = np.random.default_rng(11)
        size = rng.integers(0, 50, 400)  # heavy ties in the lead column
        tag = np.array([f"t{v:04d}" for v in rng.permutation(400)])
        ds = _ds(
            {"size": pa.array(size, pa.int64()), "tag": pa.array(tag)}
        ).repartition(7)
        got = {
            (r["size"], r["tag"]): r["rnk"]
            for r in rk.global_rank(
                ds, ["size", "tag"], num_partitions=8, sample_per_block=4
            ).take_all()
        }
        want = _expected_ranks(list(zip(size.tolist(), tag.tolist())))
        assert got == want

    def test_degenerate_all_tied_lead_column(self):
        # every sampled boundary identical -> collapses to few
        # partitions; ranks must still be exact
        tag = [f"x{i:03d}" for i in range(40)]
        ds = _ds({"c": pa.array([7] * 40, pa.int64()), "tag": pa.array(tag)})
        got = [
            r["rnk"]
            for r in rk.global_rank(ds, ["c", "tag"], num_partitions=16)
            .sort("tag")
            .take_all()
        ]
        assert got == list(range(40))

    def test_rejects_bad_args(self):
        ds = _ds({"a": pa.array([1], pa.int64())})
        with pytest.raises(ValueError):
            rk.global_rank(ds, [])
        with pytest.raises(ValueError):
            rk.global_rank(ds, ["nope"])
        with pytest.raises(ValueError):
            rk.global_rank(ds, ["a"], num_partitions=0)


def _brute_pairs(keys: list[tuple], ids: list[str], w: int) -> set:
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    out = set()
    for i in range(len(order)):
        for d in range(1, w + 1):
            if i + d < len(order):
                out.add((ids[order[i]], ids[order[i + d]], d))
    return out


class TestSortedNeighborhoodPairs:
    def test_matches_brute_force_cross_chunk(self):
        rng = np.random.default_rng(5)
        size = rng.integers(0, 30, 120)
        ids = [f"id{i:03d}" for i in range(120)]
        ds = _ds(
            {"size": pa.array(size, pa.int64()), "fid": pa.array(ids)}
        ).repartition(5)
        # chunk << n forces many cross-chunk windows
        got = {
            (r["a"], r["b"], r["dist"])
            for r in rk.sorted_neighborhood_pairs(
                ds, ["size", "fid"], "fid", window=3, chunk=8,
                num_partitions=6,
            ).take_all()
        }
        keys = list(zip(size.tolist(), ids))
        assert got == _brute_pairs(keys, ids, 3)
        assert len(got) == 3 * 120 - 3 * 4 // 2

    def test_window_wider_than_corpus(self):
        ds = _ds({"k": pa.array([2, 1], pa.int64()),
                  "fid": pa.array(["b", "a"])})
        got = rk.sorted_neighborhood_pairs(
            ds, ["k", "fid"], "fid", window=10
        ).take_all()
        assert [(r["a"], r["b"], r["dist"]) for r in got] == [("a", "b", 1)]

    def test_rejects_bad_params(self):
        ds = _ds({"k": pa.array([1], pa.int64()), "fid": pa.array(["a"])})
        with pytest.raises(ValueError):
            rk.sorted_neighborhood_pairs(ds, ["k"], "fid", window=0)
        with pytest.raises(ValueError):
            rk.sorted_neighborhood_pairs(ds, ["k"], "fid", window=1, chunk=0)
