"""Unit oracles for the profiling/funnel batch: fixed-width value
histograms, per-group min-max scaling, corpus bigram top-k, and the
two-step conversion funnel."""

import numpy as np
import pyarrow as pa

import ray
import ray.data


class TestValueHistogram:
    def test_bins_and_counts(self, ray_session):
        from duplicate_finder_ray.stages.stats import value_histogram

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "g": ["a", "a", "a", "b", "b"],
                    "v": [0.5, 24.999999, 25.0, 0.0, 75.5],
                }
            )
        )
        out = {
            (r["g"], r["bin_lo_micro"]): r["n"]
            for r in value_histogram(ds, "g", "v", 25_000_000).take_all()
        }
        # 25.0 sits exactly on the boundary -> bin 25, not 0
        assert out == {
            ("a", 0): 2,
            ("a", 25_000_000): 1,
            ("b", 0): 1,
            ("b", 75_000_000): 1,
        }

    def test_negative_values_truncate_like_sql(self, ray_session):
        """numpy's // floors; SQL's // truncates — the stage must match
        SQL (DuckDB: -500000 // 25000000 = 0, so -0.5 lands in bin 0)."""
        from duplicate_finder_ray.stages.stats import value_histogram

        ds = ray.data.from_arrow(
            pa.table({"g": ["a", "a"], "v": [-0.5, -26.0]})
        )
        out = {
            r["bin_lo_micro"]: r["n"]
            for r in value_histogram(ds, "g", "v", 25_000_000).take_all()
        }
        assert out == {0: 1, -25_000_000: 1}


class TestMinMaxScale:
    def test_scaling_and_degenerate_group(self, ray_session):
        from duplicate_finder_ray.stages.stats import minmax_scale

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "g": ["a", "a", "a", "b", "b"],
                    "x": pa.array([10, 20, 40, 7, 7], pa.int64()),
                }
            )
        )
        out = {
            r["id"]: r["scaled_micro"]
            for r in minmax_scale(ds, "g", "x", ["id"]).take_all()
        }
        # a: min 10, max 40 -> 0, (10*1e6)//30, 1e6 ; b degenerate -> 0
        assert out == {1: 0, 2: 333_333, 3: 1_000_000, 4: 0, 5: 0}


class TestTopBigrams:
    def test_counts_ties_and_doc_boundary(self, ray_session):
        from duplicate_finder_ray.stages.textstats import top_bigrams

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "text": [
                        "x y x y z",
                        "y z",  # doc boundary: no (z, y) pair across docs
                        "a b",
                    ]
                }
            )
        )
        rows = top_bigrams(ds, "text", 10).take_all()
        got = {(r["tok_a"], r["tok_b"]): (r["n"], r["rank"]) for r in rows}
        assert got[("x", "y")] == (2, 1)
        assert got[("y", "z")] == (2, 2)  # tie with (x,y): tok_a asc
        assert got[("a", "b")][0] == 1
        assert got[("y", "x")][0] == 1
        assert ("z", "y") not in got

    def test_parallelism_invariance(self, ray_session):
        from duplicate_finder_ray.stages.textstats import top_bigrams

        texts = [f"t{i % 5} t{(i + 1) % 5} t{(i * 3) % 5}" for i in range(200)]
        a = top_bigrams(
            ray.data.from_arrow(pa.table({"text": texts})), "text", 8
        ).take_all()
        b = top_bigrams(
            ray.data.from_arrow(pa.table({"text": texts})).repartition(13),
            "text",
            8,
        ).take_all()
        key = lambda r: (r["rank"], r["tok_a"], r["tok_b"], r["n"])
        assert sorted(map(key, a)) == sorted(map(key, b))


class TestFunnel:
    def test_conversion_semantics(self, ray_session):
        from duplicate_finder_ray.stages.events import funnel_conversions

        rows = [
            # user 1: converts (signup 100 -> purchase 300)
            (1, "signup", 100),
            (1, "purchase", 300),
            (1, "purchase", 200),  # earliest purchase still after signup
            # user 2: purchase BEFORE signup -> excluded
            (2, "purchase", 50),
            (2, "signup", 60),
            # user 3: signup only -> excluded
            (3, "signup", 10),
            # user 4: simultaneous -> excluded (strict >)
            (4, "signup", 500),
            (4, "purchase", 500),
            # user 5: other event types ignored
            (5, "signup", 5),
            (5, "click", 6),
            (5, "purchase", 9),
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array([r[1] for r in rows], pa.string()),
                    "ts": pa.array(
                        [r[2] for r in rows], pa.timestamp("us")
                    ),
                }
            )
        )
        out = {
            r["user_id"]: (r["first_us"], r["then_us"], r["delay_us"])
            for r in funnel_conversions(ds).take_all()
        }
        assert out == {1: (100, 200, 100), 5: (5, 9, 4)}
