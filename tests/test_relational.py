"""Unit tests for stages/relational.py + the sliding-window rollup —
semantics edges the driver-gate queries don't isolate: strict-before
as-of matching, fill on no-match, range-join drops, top-k ties, set-op
duplicates, sample determinism, left-join null padding."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from duplicate_finder_ray.stages import relational as rel


def _ds(d: dict) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table(d))


def _rows(ds) -> list[dict]:
    return sorted(ds.take_all(), key=lambda r: sorted(r.items()).__repr__())


class TestBroadcastHashJoin:
    def test_inner(self):
        left = _ds({"k": [1, 2, 3, 2], "x": ["a", "b", "c", "d"]})
        right = _ds({"rk": [2, 3, 9], "y": [20, 30, 90]})
        out = rel.broadcast_hash_join(left, right, "k", "rk", ["y"]).take_all()
        got = sorted((r["k"], r["x"], r["y"]) for r in out)
        assert got == [(2, "b", 20), (2, "d", 20), (3, "c", 30)]

    def test_left_pads_nulls(self):
        left = _ds({"k": [1, 2], "x": ["a", "b"]})
        right = _ds({"rk": [2], "y": [20]})
        out = rel.broadcast_hash_join(
            left, right, "k", "rk", ["y"], how="left"
        ).take_all()
        got = {r["k"]: r["y"] for r in out}
        assert got == {1: None, 2: 20}

    def test_left_against_empty_right(self):
        # a left join against an empty dimension table must return every
        # left row with null right columns (used to crash on rt.take
        # against the 0-row table)
        left = _ds({"k": [1, 2, 3], "x": ["a", "b", "c"]})
        right = _ds({"rk": [], "y": []})
        out = rel.broadcast_hash_join(
            left, right, "k", "rk", ["y"], how="left"
        ).take_all()
        got = sorted((r["k"], r["x"], r["y"]) for r in out)
        assert got == [(1, "a", None), (2, "b", None), (3, "c", None)]

    def test_inner_against_empty_right(self):
        left = _ds({"k": [1, 2], "x": ["a", "b"]})
        right = _ds({"rk": [], "y": []})
        out = rel.broadcast_hash_join(left, right, "k", "rk", ["y"])
        assert out.count() == 0

    def test_duplicate_right_keys_fan_out(self):
        left = _ds({"k": [1], "x": ["a"]})
        right = _ds({"rk": [1, 1], "y": [10, 11]})
        out = rel.broadcast_hash_join(left, right, "k", "rk", ["y"]).take_all()
        assert sorted(r["y"] for r in out) == [10, 11]


class TestAsofJoin:
    def _run(self, lts, rts, rv, fill=-1):
        left = _ds(
            {
                "id": list(range(len(lts))),
                "u": [1] * len(lts),
                "ts": pa.array(lts, pa.int64()),
            }
        )
        right = _ds(
            {
                "u": [1] * len(rts),
                "rts": pa.array(rts, pa.int64()),
                "v": pa.array(rv, pa.int64()),
            }
        )
        out = rel.asof_join(left, right, "u", "ts", "rts", "v", "got", fill=fill)
        return {r["id"]: r["got"] for r in out.take_all()}

    def test_strictly_before(self):
        # event at ts=10 must NOT see the right row at ts=10
        got = self._run([5, 10, 11], [10], [100])
        assert got == {0: -1, 1: -1, 2: 100}

    def test_latest_of_several(self):
        got = self._run([50], [10, 20, 30], [1, 2, 3])
        assert got == {0: 3}

    def test_no_right_rows_fill(self):
        left = _ds({"id": [0], "u": [1], "ts": pa.array([5], pa.int64())})
        right = _ds(
            {
                "u": pa.array([], pa.int64()),
                "rts": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
            }
        )
        out = rel.asof_join(left, right, "u", "ts", "rts", "v", "got").take_all()
        assert out[0]["got"] == -1

    def test_keys_do_not_cross(self):
        left = _ds({"id": [0], "u": [1], "ts": pa.array([100], pa.int64())})
        right = _ds(
            {"u": [2], "rts": pa.array([5], pa.int64()), "v": pa.array([9], pa.int64())}
        )
        out = rel.asof_join(left, right, "u", "ts", "rts", "v", "got").take_all()
        assert out[0]["got"] == -1


class TestRangeJoin:
    def test_assign_and_drop(self):
        ds = _ds({"v": pa.array([5, 10, 19, 20, 35, -1], pa.int64())})
        out = rel.range_join_buckets(
            ds, "v", [(0, 0, 10), (1, 10, 20), (2, 30, 40)]
        ).take_all()
        got = sorted((r["v"], r["bucket_id"]) for r in out)
        # 20 falls in the gap [20,30) and -1 below all ranges -> dropped
        assert got == [(5, 0), (10, 1), (19, 1), (35, 2)]

    def test_rejects_unsorted(self):
        with pytest.raises(ValueError):
            rel.range_join_buckets(_ds({"v": [1]}), "v", [(0, 10, 20), (1, 0, 5)])


class TestTopkPerGroup:
    def test_rank_and_ties(self):
        ds = _ds(
            {
                "g": ["a", "a", "a", "a", "b"],
                "score": pa.array([5, 9, 9, 1, 7], pa.int64()),
                "id": pa.array([4, 2, 1, 3, 0], pa.int64()),
            }
        )
        out = rel.topk_per_group(ds, "g", "score", "id", k=3).take_all()
        a = sorted(
            ((r["rank"], r["id"], r["score"]) for r in out if r["g"] == "a")
        )
        # ties on score=9 break by id asc: id=1 first
        assert a == [(1, 1, 9), (2, 2, 9), (3, 4, 5)]
        b = [(r["rank"], r["id"]) for r in out if r["g"] == "b"]
        assert b == [(1, 0)]


class TestSetOps:
    def test_intersect_and_except_dedupe(self):
        a = _ds({"k": ["x", "x", "y", "z"]})
        b = _ds({"k": ["y", "y", "w"]})
        inter = sorted(r["k"] for r in rel.intersect_keys(a, b, "k").take_all())
        exc = sorted(r["k"] for r in rel.except_keys(a, b, "k").take_all())
        assert inter == ["y"]
        assert exc == ["x", "z"]


class TestDeterministicSample:
    def test_matches_hashlib(self):
        ids = list(range(200))
        ds = _ds({"doc_id": pa.array(ids, pa.int64())})
        got = sorted(
            r["doc_id"] for r in rel.deterministic_sample(ds, "doc_id", "20").take_all()
        )
        want = [
            i
            for i in ids
            if hashlib.md5(str(i).encode()).hexdigest()[:2] < "20"
        ]
        assert got == want
        assert 0 < len(want) < 200


class TestGroupedQuantiles:
    def test_linear_interp_centi(self):
        ds = _ds(
            {
                "g": ["a"] * 4 + ["b"],
                "v": pa.array([1, 2, 3, 4, 10], pa.int64()),
            }
        )
        out = {r["g"]: (r["p50_x100"], r["p90_x100"]) for r in rel.grouped_quantiles(
            ds, "g", "v", [("p50_x100", 0.5), ("p90_x100", 0.9)]
        ).take_all()}
        # a: p50 = 2.5 -> 250; p90 = 3.7 -> 370 (numpy linear)
        assert out["a"] == (250, int(np.floor(np.quantile([1, 2, 3, 4], 0.9) * 100 + 0.5)))
        assert out["b"] == (1000, 1000)


class TestGroupedSumRollup:
    def test_cents_exact(self):
        ds = _ds(
            {
                "g": ["a", "a", "b"],
                "v": pa.array([1.005, 2.0, 0.1], pa.float64()),
            }
        )
        out = {r["g"]: (r["n_rows"], r["vc"]) for r in rel.grouped_sum_rollup(
            ds, ["g"], {"v": "vc"}
        ).take_all()}
        # 1.005 stores as 1.00499999... -> floor(100.499..+0.5)=100? No:
        # floor(1.005*100 + 0.5) = floor(101.0) = 101 when the double
        # rounds up, 100 when down — assert the same IEEE expression.
        want_a = int(np.floor(1.005 * 100 + 0.5)) + 200
        assert out["a"] == (2, want_a)
        assert out["b"] == (1, 10)


class TestSlidingRollup:
    def test_fanout_and_sums(self):
        from duplicate_finder_ray.stages.events import sliding_rollup

        ts = pa.array(
            np.array([0, 900, 3600], dtype="datetime64[s]").astype("datetime64[us]")
        )
        ds = ray.data.from_arrow(
            pa.table({"ts": ts, "value": pa.array([1.0, 2.0, 4.0])})
        )
        out = {
            r["window_start_us"]: (r["n_events"], r["sum_value_cents"])
            for r in sliding_rollup(ds, 60, 15).take_all()
        }
        # event@0 -> windows starting at -45,-30,-15,0 min
        assert out[0] == (2, 300)  # events at 0s and 900s
        assert out[900 * 10**6] == (2, 600)  # events at 900s and 3600s
        assert out[3600 * 10**6] == (1, 400)
        # union of the 3 events' window-start sets:
        # {-45,-30,-15,0} ∪ {-30,-15,0,15} ∪ {15,30,45,60} minutes
        assert len(out) == 8

    def test_rejects_nonmultiple(self):
        from duplicate_finder_ray.stages.events import sliding_rollup

        with pytest.raises(ValueError):
            sliding_rollup(_ds({"ts": [1], "value": [1.0]}), 50, 15)


class TestSplitAssign:
    def test_matches_md5_ranges(self):
        import hashlib

        ds = _ds({"doc_id": pa.array(list(range(300)), pa.int64())})
        out = {
            r["doc_id"]: r["split"]
            for r in rel.split_assign(
                ds, "doc_id", [("train", "cd"), ("val", "e6")], "test"
            ).take_all()
        }
        for i in range(300):
            h = hashlib.md5(str(i).encode()).hexdigest()[:2]
            want = "train" if h < "cd" else ("val" if h < "e6" else "test")
            assert out[i] == want
        # ratios land near 80/10/10
        from collections import Counter

        c = Counter(out.values())
        assert c["train"] > c["val"] and c["train"] > c["test"]

    def test_rejects_bad_cuts(self):
        ds = _ds({"doc_id": pa.array([1], pa.int64())})
        with pytest.raises(ValueError):
            rel.split_assign(ds, "doc_id", [("a", "e6"), ("b", "cd")], "z")
        with pytest.raises(ValueError):
            rel.split_assign(ds, "doc_id", [("a", "c"), ("b", "e6")], "z")


class TestTopkGlobal:
    def test_matches_sorted_head(self):
        rng = np.random.default_rng(4)
        vals = rng.integers(0, 1000, size=500)
        ids = np.arange(500, dtype=np.int64)
        ds = _ds(
            {
                "id": pa.array(ids, pa.int64()),
                "v": pa.array(vals, pa.int64()),
            }
        ).repartition(7)
        got = (
            rel.topk_global(ds, by=["v", "id"], ascending=[False, True], k=10)
            .to_pandas()
        )
        order = np.lexsort((ids, -vals))[:10]
        assert list(got["id"]) == list(ids[order])
        assert list(got["rank"]) == list(range(1, 11))

    def test_k_larger_than_rows(self):
        ds = _ds({"id": pa.array([3, 1, 2], pa.int64())})
        got = rel.topk_global(ds, by=["id"], ascending=[True], k=10).to_pandas()
        assert list(got["id"]) == [1, 2, 3]

    def test_rejects_bad_params(self):
        ds = _ds({"id": pa.array([1], pa.int64())})
        with pytest.raises(ValueError):
            rel.topk_global(ds, by=[], ascending=[], k=5)
        with pytest.raises(ValueError):
            rel.topk_global(ds, by=["id"], ascending=[True], k=0)


class TestPivotSums:
    def test_matches_conditional_sums(self):
        ds = _ds(
            {
                "user_id": pa.array([1, 1, 2, 2, 1], pa.int64()),
                "event_type": pa.array(
                    ["click", "view", "click", "click", "click"]
                ),
                "value": pa.array([1.005, 2.0, 0.994, 3.0, 10.0]),
            }
        ).repartition(2)
        got = {
            r["user_id"]: (r["sum_click_cents"], r["sum_view_cents"])
            for r in rel.pivot_sums(
                ds, "user_id", "event_type", "value", ["click", "view"]
            ).take_all()
        }
        # floor(x*100+0.5): 1.005 -> 101 (binary 1.005*100 = 100.49999...
        # -> floor(+0.5)=100? compute exactly like the engine), so derive
        # expected with the same expression
        import numpy as np

        def c(x):
            return int(np.floor(x * 100.0 + 0.5))

        assert got[1] == (c(1.005) + c(10.0), c(2.0))
        assert got[2] == (c(0.994) + c(3.0), 0)

    def test_rejects_empty_categories(self):
        ds = _ds({"user_id": pa.array([1], pa.int64()),
                  "event_type": pa.array(["a"]),
                  "value": pa.array([1.0])})
        with pytest.raises(ValueError):
            rel.pivot_sums(ds, "user_id", "event_type", "value", [])


class TestSaltedDistinctCount:
    def test_matches_pandas_nunique(self):
        # one hot key (k=0) holding most values, plus cross-block
        # duplicates of the same (key, value) pair — the salted slices
        # must still partition the distinct set exactly
        rng = np.random.default_rng(7)
        keys = np.where(rng.random(4000) < 0.7, 0, rng.integers(1, 20, 4000))
        vals = rng.integers(0, 300, 4000)
        ds = _ds(
            {
                "k": pa.array(keys.astype(str)),
                "v": pa.array(vals.astype(str)),
            }
        ).repartition(8)
        got = {
            r["k"]: r["nd"]
            for r in rel.salted_distinct_count(
                ds, "k", "v", n_salts=4, parts_per_salt=2, alias="nd"
            ).take_all()
        }
        import pandas as pd

        want = (
            pd.DataFrame({"k": keys.astype(str), "v": vals.astype(str)})
            .groupby("k")["v"]
            .nunique()
            .to_dict()
        )
        assert got == want

    def test_salt_one_equals_plain_groupby(self):
        ds = _ds({"k": pa.array(["a", "a", "b"]), "v": pa.array(["x", "x", "x"])})
        got = {
            r["k"]: r["n_distinct"]
            for r in rel.salted_distinct_count(
                ds, "k", "v", n_salts=1, parts_per_salt=1
            ).take_all()
        }
        assert got == {"a": 1, "b": 1}

    def test_rejects_bad_params(self):
        ds = _ds({"k": pa.array(["a"]), "v": pa.array(["x"])})
        with pytest.raises(ValueError):
            rel.salted_distinct_count(ds, "k", "v", n_salts=0)
        with pytest.raises(ValueError):
            rel.salted_distinct_count(ds, "k", "v", parts_per_salt=0)


class TestParetoFrontier:
    def _brute(self, pts):
        out = []
        for i, (x, y) in enumerate(pts):
            dom = any(
                (bx >= x and by >= y and (bx > x or by > y))
                for j, (bx, by) in enumerate(pts)
                if j != i
            )
            if not dom:
                out.append((x, y))
        return sorted(out)

    def test_matches_not_exists_semantics(self):
        rng = np.random.default_rng(21)
        x = rng.integers(0, 40, 300).astype(np.int64)
        y = rng.integers(0, 40, 300).astype(np.int64)
        ds = _ds({"x": pa.array(x), "y": pa.array(y),
                  "tag": pa.array([f"t{i}" for i in range(300)])}
                 ).repartition(6)
        got = sorted(
            (r["x"], r["y"])
            for r in rel.pareto_frontier(ds, "x", "y").take_all()
        )
        assert got == self._brute(list(zip(x.tolist(), y.tolist())))

    def test_exact_ties_all_survive(self):
        ds = _ds({"x": pa.array([5, 5, 3], pa.int64()),
                  "y": pa.array([7, 7, 9], pa.int64())})
        got = sorted(
            (r["x"], r["y"])
            for r in rel.pareto_frontier(ds, "x", "y").take_all()
        )
        assert got == [(3, 9), (5, 7), (5, 7)]

    def test_rejects_non_integer(self):
        ds = _ds({"x": pa.array([1.0]), "y": pa.array([2], pa.int64())})
        with pytest.raises(ValueError):
            rel.pareto_frontier(ds, "x", "y")
