"""Unit tests for the shuffle hash join (stages/join.py) and the
Bloom-prefiltered exact semi-join (stages/bloom.py) — edges the driver
gate doesn't isolate: left-join null padding against empty and
non-empty right sides, duplicate keys on both sides, semi-join
emit-once semantics, Bloom no-false-negatives, and false-positive
removal by the exact pass."""

import numpy as np
import pyarrow as pa

import ray.data

from duplicate_finder_ray.stages.bloom import (
    bloom_contains,
    bloom_semi_join,
    build_bloom,
)
from duplicate_finder_ray.stages.join import shuffle_hash_join


def _ds(d: dict) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table(d))


class TestShuffleHashJoin:
    def test_inner_duplicate_keys_both_sides(self, ray_session):
        left = _ds({"k": [1, 1, 2, 3], "x": ["a", "b", "c", "d"]})
        right = _ds({"rk": [1, 1, 2, 9], "y": [10, 11, 20, 90]})
        out = shuffle_hash_join(left, right, "k", "rk", 3).take_all()
        got = sorted((r["k"], r["x"], r["y"]) for r in out)
        assert got == [
            (1, "a", 10),
            (1, "a", 11),
            (1, "b", 10),
            (1, "b", 11),
            (2, "c", 20),
        ]

    def test_left_pads_nulls(self, ray_session):
        left = _ds({"k": [1, 2, 5], "x": ["a", "b", "c"]})
        right = _ds({"rk": [2], "y": [20]})
        out = shuffle_hash_join(left, right, "k", "rk", 2, how="left").take_all()
        got = sorted(((r["k"], r["x"], r["y"]) for r in out), key=str)
        assert (2, "b", 20) in got
        nulls = [(r["k"], r["y"]) for r in out if r["y"] is None]
        assert sorted(k for k, _ in nulls) == [1, 5]

    def test_left_against_empty_right(self, ray_session):
        left = _ds({"k": [1, 2], "x": ["a", "b"]})
        right = _ds({"rk": [1], "y": [9]}).filter(lambda r: False)
        out = shuffle_hash_join(
            left, right, "k", "rk", 2, right_cols=["y"], how="left"
        ).take_all()
        assert sorted(r["k"] for r in out) == [1, 2]
        assert all(r["y"] is None for r in out)

    def test_semi_emits_each_left_row_once(self, ray_session):
        left = _ds({"k": [1, 1, 2, 3], "x": ["a", "b", "c", "d"]})
        right = _ds({"rk": [1, 1, 1, 3], "z": [0, 0, 0, 0]})
        out = shuffle_hash_join(left, right, "k", "rk", 2, how="semi").take_all()
        got = sorted((r["k"], r["x"]) for r in out)
        assert got == [(1, "a"), (1, "b"), (3, "d")]
        assert all(set(r) == {"k", "x"} for r in out)

    def test_string_keys(self, ray_session):
        left = _ds({"k": ["aa", "bb", "cc"], "x": [1, 2, 3]})
        right = _ds({"rk": ["bb", "cc"], "y": ["B", "C"]})
        out = shuffle_hash_join(left, right, "k", "rk", 2).take_all()
        assert sorted((r["k"], r["y"]) for r in out) == [("bb", "B"), ("cc", "C")]

    def test_matches_oracle_at_scale(self, ray_session):
        rng = np.random.default_rng(7)
        lk = rng.integers(0, 500, 5000)
        rk = rng.integers(0, 500, 800)
        left = _ds({"k": lk, "x": np.arange(5000)})
        right = _ds({"rk": rk, "y": np.arange(800)})
        out = shuffle_hash_join(left, right, "k", "rk", 8).take_all()
        import pandas as pd

        exp = pd.DataFrame({"k": lk, "x": np.arange(5000)}).merge(
            pd.DataFrame({"k": rk, "y": np.arange(800)}), on="k"
        )
        assert len(out) == len(exp)
        got = sorted((r["k"], r["x"], r["y"]) for r in out)
        want = sorted(map(tuple, exp[["k", "x", "y"]].to_numpy()))
        assert got == want


class TestBloom:
    def test_no_false_negatives(self, ray_session):
        keys = _ds({"k": list(range(0, 4000, 2))})
        words = ray.get(build_bloom(keys, "k", n_bits=1 << 18, k=4))
        ins = np.arange(0, 4000, 2, dtype=np.int64)
        assert bloom_contains(words, ins, 1 << 18, 4).all()

    def test_fpr_bounded(self, ray_session):
        keys = _ds({"k": list(range(0, 20000, 2))})
        words = ray.get(build_bloom(keys, "k", n_bits=1 << 20, k=4))
        absent = np.arange(1, 20000, 2, dtype=np.int64)
        assert bloom_contains(words, absent, 1 << 20, 4).mean() < 0.01

    def test_semi_join_exact_despite_false_positives(self, ray_session):
        # a deliberately tiny filter (high fpr) must still yield the
        # exact answer because the exchange pass verifies
        big = _ds({"k": list(range(2000)), "v": list(range(2000))})
        sel = _ds({"sk": list(range(0, 2000, 13))})
        out = bloom_semi_join(big, sel, "k", "sk", 4, n_bits=256, k=2).take_all()
        assert sorted(r["v"] for r in out) == list(range(0, 2000, 13))

    def test_semi_join_string_keys(self, ray_session):
        big = _ds({"k": [f"d{i % 7}" for i in range(70)], "v": list(range(70))})
        sel = _ds({"sk": ["d2", "d5"]})
        out = bloom_semi_join(big, sel, "k", "sk", 3).take_all()
        assert len(out) == 20
        assert {r["k"] for r in out} == {"d2", "d5"}


class TestRepetitionRedaction:
    def test_repetition_counts(self, ray_session):
        from duplicate_finder_ray.stages.textstats import repetition_stats

        batch = pa.table(
            {"doc_id": [0, 1, 2], "text": ["a b a b a", "x y z", "q"]}
        )
        out = {r["doc_id"]: r for r in repetition_stats(batch).to_pylist()}
        assert out[0]["n_tokens"] == 5 and out[0]["n_distinct_tokens"] == 2
        assert out[0]["top_token_n"] == 3  # 'a' ×3
        assert out[0]["n_2grams"] == 4 and out[0]["n_distinct_2grams"] == 2
        assert out[0]["top_2gram_n"] == 2  # 'a b' ×2
        assert out[1]["n_distinct_2grams"] == 2 and out[1]["top_2gram_n"] == 1
        assert out[2]["n_tokens"] == 1 and out[2]["n_2grams"] == 0

    def test_redact_multiple_patterns(self, ray_session):
        from duplicate_finder_ray.stages.textstats import redact_text

        batch = pa.table(
            {"id": [1, 2], "t": ["call 555 or 777 x", "a@b.co says hi"]}
        )
        out = redact_text(
            batch,
            [("[0-9]+", "<NUM>"), (r"[A-Za-z0-9.]+@[A-Za-z0-9.]+", "<EMAIL>")],
            "t",
            "t_red",
            "id",
        ).to_pylist()
        by = {r["id"]: r for r in out}
        assert by[1]["t_red"] == "call <NUM> or <NUM> x"
        assert by[1]["n_redactions"] == 2
        assert by[2]["t_red"] == "<EMAIL> says hi"
        assert by[2]["n_redactions"] == 1


class TestFullJoin:
    def test_both_sides_unmatched_survive(self, ray_session):
        left = _ds({"k": [1, 2], "x": ["a", "b"]})
        right = _ds({"rk": [2, 3], "z": [20, 30]})
        out = shuffle_hash_join(left, right, "k", "rk", 2, how="full").take_all()
        rows = {r["k"]: (r["x"], r["z"]) for r in out}
        assert rows[1] == ("a", None)  # left-only
        assert rows[2] == ("b", 20)  # matched
        assert rows[3] == (None, 30)  # right-only, key coalesced
        assert len(out) == 3

    def test_full_against_empty_right(self, ray_session):
        left = _ds({"k": [1], "x": ["a"]})
        right = _ds({"rk": [9], "z": [0]}).filter(lambda r: False)
        out = shuffle_hash_join(
            left, right, "k", "rk", 2, right_cols=["z"], how="full"
        ).take_all()
        assert [(r["k"], r["x"], r["z"]) for r in out] == [(1, "a", None)]

    def test_full_duplicate_keys_cross_product(self, ray_session):
        left = _ds({"k": [5, 5], "x": ["a", "b"]})
        right = _ds({"rk": [5, 5], "z": [1, 2]})
        out = shuffle_hash_join(left, right, "k", "rk", 2, how="full").take_all()
        assert sorted((r["x"], r["z"]) for r in out) == [
            ("a", 1), ("a", 2), ("b", 1), ("b", 2)
        ]


class TestAntiJoin:
    def test_anti_complements_semi(self, ray_session):
        left = _ds({"k": [1, 1, 2, 3, 4], "x": list("abcde")})
        right = _ds({"rk": [1, 3], "z": [0, 0]})
        semi = shuffle_hash_join(left, right, "k", "rk", 2, how="semi").take_all()
        anti = shuffle_hash_join(left, right, "k", "rk", 2, how="anti").take_all()
        assert sorted(r["x"] for r in semi) == ["a", "b", "d"]
        assert sorted(r["x"] for r in anti) == ["c", "e"]
        assert len(semi) + len(anti) == 5
        assert all(set(r) == {"k", "x"} for r in anti)

    def test_anti_against_empty_right_keeps_all(self, ray_session):
        left = _ds({"k": [1, 2], "x": ["a", "b"]})
        right = _ds({"rk": [9], "z": [0]}).filter(lambda r: False)
        out = shuffle_hash_join(
            left, right, "k", "rk", 2, right_cols=[], how="anti"
        ).take_all()
        assert sorted(r["k"] for r in out) == [1, 2]


class TestSkewSalting:
    def _sides(self):
        rng = np.random.default_rng(3)
        # one mega key (0) with 600 left rows; right has 1-2 rows per key
        lk = np.where(rng.random(800) < 0.75, 0, rng.integers(1, 12, 800))
        left = _ds({"k": pa.array(lk, pa.int64()),
                    "x": pa.array(np.arange(800, dtype=np.int64))})
        rk = np.array([0, 0, 1, 2, 3, 5, 7, 9, 11, 20], dtype=np.int64)
        right = _ds({"rk": pa.array(rk),
                     "y": pa.array(rk * 10)})
        return left.repartition(6), right

    def _pairs(self, rows, cols):
        return sorted(tuple(r[c] for c in cols) for r in rows)

    def test_salted_equals_unsalted_all_hows(self, ray_session):
        from duplicate_finder_ray.stages.join import skew_join

        left, right = self._sides()
        for how, cols in [
            ("inner", ["k", "x", "y"]),
            ("left", ["k", "x", "y"]),
            ("semi", ["k", "x"]),
            ("anti", ["k", "x"]),
        ]:
            plain = shuffle_hash_join(
                left, right, "k", "rk", 5, how=how
            ).take_all()
            salted = skew_join(
                left, right, "k", "rk", 5, how=how,
                hot_threshold=50, n_salts=4,
            ).take_all()
            assert self._pairs(salted, cols) == self._pairs(plain, cols), how

    def test_n_salts_clamped_to_n_parts(self, ray_session):
        from duplicate_finder_ray.stages.join import skew_join

        left, right = self._sides()
        plain = shuffle_hash_join(left, right, "k", "rk", 3).take_all()
        salted = skew_join(
            left, right, "k", "rk", 3, hot_threshold=50, n_salts=64
        ).take_all()
        assert self._pairs(salted, ["k", "x", "y"]) == self._pairs(
            plain, ["k", "x", "y"]
        )

    def test_full_rejected_under_salting(self, ray_session):
        left, right = self._sides()
        import pytest as _pytest

        with _pytest.raises(ValueError):
            shuffle_hash_join(
                left, right, "k", "rk", 4, how="full", hot_keys={0}
            )


class TestIntervalOverlapJoin:
    def test_matches_brute_force(self, ray_session):
        from duplicate_finder_ray.stages.join import interval_overlap_join

        rng = np.random.default_rng(17)
        ls = rng.integers(0, 10_000, 80).astype(np.int64)
        le = ls + rng.integers(1, 800, 80)
        rs = rng.integers(0, 10_000, 60).astype(np.int64)
        re_ = rs + rng.integers(1, 800, 60)
        left = _ds({"lid": pa.array(np.arange(80), pa.int64()),
                    "s": pa.array(ls), "e": pa.array(le)}).repartition(4)
        right = _ds({"rid": pa.array(np.arange(60), pa.int64()),
                     "s": pa.array(rs), "e": pa.array(re_)}).repartition(3)
        got = sorted(
            (r["l_id"], r["r_id"])
            for r in interval_overlap_join(
                left, right, "lid", "rid", cell=256, n_parts=8
            ).take_all()
        )
        want = sorted(
            (i, j)
            for i in range(80)
            for j in range(60)
            if ls[i] < re_[j] and rs[j] < le[i]
        )
        assert got == want  # exactly once per pair (single-cell ownership)

    def test_rejects_bad_intervals(self, ray_session):
        from duplicate_finder_ray.stages.join import interval_overlap_join

        bad = _ds({"lid": pa.array([1], pa.int64()),
                   "s": pa.array([5], pa.int64()),
                   "e": pa.array([5], pa.int64())})
        ok = _ds({"rid": pa.array([1], pa.int64()),
                  "s": pa.array([0], pa.int64()),
                  "e": pa.array([1], pa.int64())})
        import pytest as _pytest

        with _pytest.raises(ValueError):
            interval_overlap_join(bad, ok, "lid", "rid", cell=0)
        with _pytest.raises(Exception):
            interval_overlap_join(
                bad, ok, "lid", "rid", cell=16
            ).take_all()
