"""Unit tests for the Myers bit-parallel Levenshtein kernel and the
edit-distance pair verify stage — kernel equality against a classic DP
and against DuckDB's byte-unit levenshtein(), plus the stage's
max_dist filter and broadcast endpoint fetch."""

import random

import duckdb
import pyarrow as pa

import ray.data

from duplicate_finder_ray.stages.editdist import (
    edit_distance_pairs,
    myers_levenshtein,
)


def classic_dp(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return prev[len(b)]


class TestMyersKernel:
    def test_edges(self):
        assert myers_levenshtein(b"", b"") == 0
        assert myers_levenshtein(b"", b"abc") == 3
        assert myers_levenshtein(b"abc", b"") == 3
        assert myers_levenshtein(b"abc", b"abc") == 0
        assert myers_levenshtein(b"kitten", b"sitting") == 3

    def test_fuzz_vs_classic_dp(self):
        rng = random.Random(7)
        for _ in range(200):
            a = bytes(rng.randrange(256) for _ in range(rng.randint(0, 40)))
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 40)))
            assert myers_levenshtein(a, b) == classic_dp(a, b), (a, b)

    def test_fuzz_vs_duckdb_bytes(self):
        # DuckDB's levenshtein is UTF-8-byte unit-cost: multibyte chars
        # count per byte — the engine encodes before scoring to match
        con = duckdb.connect()
        rng = random.Random(11)
        alphabet = "ab 中é\n"
        for _ in range(100):
            s1 = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
            s2 = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
            want = con.execute("SELECT levenshtein(?, ?)", [s1, s2]).fetchone()[0]
            assert myers_levenshtein(s1.encode(), s2.encode()) == want

    def test_long_pattern_beyond_word_width(self):
        # >64-byte strings exercise the unbounded-int bit lane
        a = b"x" * 300
        b = b"x" * 280 + b"yyyy" + b"x" * 20
        assert myers_levenshtein(a, b) == classic_dp(a, b)


class TestEditDistancePairs:
    def _run(self, contents, pairs, max_dist):
        docs = ray.data.from_arrow(
            pa.table(
                {
                    "file_id": pa.array(list(contents), pa.string()),
                    "content": pa.array(list(contents.values()), pa.string()),
                }
            )
        )
        pairs_ds = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([p[0] for p in pairs], pa.string()),
                    "b": pa.array([p[1] for p in pairs], pa.string()),
                }
            )
        )
        out = edit_distance_pairs(
            docs, pairs_ds, "file_id", "content", max_dist
        ).take_all()
        return {(r["a"], r["b"]): r["lev"] for r in out}

    def test_distances_and_filter(self, ray_session):
        contents = {
            "d1": "the quick brown fox",
            "d2": "the quick brown fix",   # 1 substitution
            "d3": "the quick brown fox!",  # 1 insertion
            "d4": "completely different text entirely",
            "d5": "the quick brown fox",   # identical to d1
        }
        got = self._run(
            contents,
            [("d1", "d2"), ("d1", "d3"), ("d1", "d4"), ("d1", "d5")],
            max_dist=5,
        )
        assert got == {("d1", "d2"): 1, ("d1", "d3"): 1, ("d1", "d5"): 0}

    def test_multibyte_counts_bytes(self, ray_session):
        got = self._run({"a": "中", "b": "国"}, [("a", "b")], max_dist=10)
        assert got == {("a", "b"): 3}
