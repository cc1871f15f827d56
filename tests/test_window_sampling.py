"""Unit tests for running_totals (windowed cumulative sums) and
stratified_sample — semantics the driver gate doesn't isolate:
cross-user isolation of cumulative sums, time ordering, per-group
rates, parallelism invariance."""

import numpy as np
import pyarrow as pa

import ray.data

from duplicate_finder_ray.stages.events import (
    lag_deltas,
    rolling_sum_rows,
    running_totals,
)
from duplicate_finder_ray.stages.relational import (
    sample_n_per_group,
    stratified_sample,
)


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )


class TestRunningTotals:
    def test_per_user_cumsum_and_seq(self, ray_session):
        rows = [
            (1, 1000, 7, 1.0),
            (2, 2000, 7, 2.5),
            (3, 3000, 7, 0.5),
            (4, 1500, 8, 10.0),
            (5, 2500, 8, 0.25),
        ]
        out = {r["event_id"]: r for r in running_totals(_events(rows), 4).take_all()}
        assert [out[i]["cum_value_cents"] for i in (1, 2, 3)] == [100, 350, 400]
        assert [out[i]["event_seq"] for i in (1, 2, 3)] == [1, 2, 3]
        assert [out[i]["cum_value_cents"] for i in (4, 5)] == [1000, 1025]
        assert [out[i]["event_seq"] for i in (4, 5)] == [1, 2]

    def test_orders_by_time_not_input_order(self, ray_session):
        rows = [(1, 9000, 3, 5.0), (2, 1000, 3, 1.0)]
        out = {r["event_id"]: r for r in running_totals(_events(rows), 2).take_all()}
        assert out[2]["event_seq"] == 1 and out[2]["cum_value_cents"] == 100
        assert out[1]["event_seq"] == 2 and out[1]["cum_value_cents"] == 600

    def test_partition_count_invariant(self, ray_session):
        rng = np.random.default_rng(3)
        rows = [
            (i, int(rng.integers(0, 10**6)), int(rng.integers(0, 20)),
             float(rng.uniform(0, 10)))
            for i in range(500)
        ]
        a = sorted(map(tuple, (
            (r["event_id"], r["event_seq"], r["cum_value_cents"])
            for r in running_totals(_events(rows), 2).take_all()
        )))
        b = sorted(map(tuple, (
            (r["event_id"], r["event_seq"], r["cum_value_cents"])
            for r in running_totals(_events(rows), 16).take_all()
        )))
        assert a == b


class TestLagDeltas:
    def test_gaps_isolated_per_user(self, ray_session):
        rows = [
            (1, 1000, 7, 0.0),
            (2, 4000, 7, 0.0),
            (3, 1500, 8, 0.0),  # between user 7's events in time
            (4, 9000, 8, 0.0),
        ]
        out = {r["event_id"]: r for r in lag_deltas(_events(rows), 4).take_all()}
        assert out[1]["prev_event_id"] == -1 and out[1]["gap_us"] == -1
        assert out[2]["prev_event_id"] == 1 and out[2]["gap_us"] == 3000
        assert out[3]["prev_event_id"] == -1 and out[3]["gap_us"] == -1
        assert out[4]["prev_event_id"] == 3 and out[4]["gap_us"] == 7500

    def test_ties_break_by_event_id(self, ray_session):
        rows = [(5, 1000, 1, 0.0), (2, 1000, 1, 0.0)]
        out = {r["event_id"]: r for r in lag_deltas(_events(rows), 2).take_all()}
        assert out[2]["prev_event_id"] == -1
        assert out[5]["prev_event_id"] == 2 and out[5]["gap_us"] == 0

    def test_partition_count_invariant(self, ray_session):
        rng = np.random.default_rng(7)
        rows = [
            (i, int(rng.integers(0, 10**6)), int(rng.integers(0, 15)), 0.0)
            for i in range(400)
        ]
        a = sorted(
            (r["event_id"], r["prev_event_id"], r["gap_us"])
            for r in lag_deltas(_events(rows), 2).take_all()
        )
        b = sorted(
            (r["event_id"], r["prev_event_id"], r["gap_us"])
            for r in lag_deltas(_events(rows), 16).take_all()
        )
        assert a == b


class TestRollingSumRows:
    def test_window_clamps_at_user_start(self, ray_session):
        rows = [
            (1, 1000, 7, 1.0),
            (2, 2000, 7, 2.0),
            (3, 3000, 7, 4.0),
            (4, 4000, 7, 8.0),
            (5, 1500, 8, 16.0),
        ]
        out = {
            r["event_id"]: r["win_value_cents"]
            for r in rolling_sum_rows(_events(rows), window=3, num_partitions=4)
            .take_all()
        }
        assert out == {1: 100, 2: 300, 3: 700, 4: 1400, 5: 1600}

    def test_window_one_is_identity(self, ray_session):
        rows = [(1, 1000, 7, 2.5), (2, 2000, 7, 4.0)]
        out = {
            r["event_id"]: r["win_value_cents"]
            for r in rolling_sum_rows(_events(rows), window=1, num_partitions=2)
            .take_all()
        }
        assert out == {1: 250, 2: 400}

    def test_rejects_bad_window(self, ray_session):
        import pytest

        with pytest.raises(ValueError):
            rolling_sum_rows(_events([(1, 0, 0, 0.0)]), window=0)


class TestSampleNPerGroup:
    def test_exact_counts_and_stability(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(300), pa.int64()),
                    "lang": pa.array(
                        ["en" if i % 3 else "de" for i in range(300)]
                    ),
                }
            )
        )
        kept = sample_n_per_group(ds, "doc_id", "lang", 10).take_all()
        by_lang = {}
        for r in kept:
            by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
        assert len(by_lang["en"]) == 10 and len(by_lang["de"]) == 10
        # stability: growing the budget keeps the smaller selection
        kept25 = {
            (r["lang"], r["doc_id"])
            for r in sample_n_per_group(ds, "doc_id", "lang", 25).take_all()
        }
        assert {(r["lang"], r["doc_id"]) for r in kept} <= kept25

    def test_small_group_returned_whole(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "lang": pa.array(["zh", "zh", "en"]),
                }
            )
        )
        kept = sample_n_per_group(ds, "doc_id", "lang", 10).take_all()
        assert len(kept) == 3
        assert {r["rank"] for r in kept if r["lang"] == "zh"} == {1, 2}


class TestStratifiedSample:
    def test_rates_differ_by_group(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(4000), pa.int64()),
                    "lang": pa.array(
                        ["en" if i % 2 else "de" for i in range(4000)]
                    ),
                }
            )
        )
        out = stratified_sample(
            ds, "doc_id", "lang", {"en": "10"}, default_hex_lt="80"
        ).take_all()
        en = sum(1 for r in out if r["lang"] == "en")
        de = sum(1 for r in out if r["lang"] == "de")
        assert 2000 * 0.02 < en < 2000 * 0.11  # ~6.25%
        assert 2000 * 0.40 < de < 2000 * 0.60  # ~50%

    def test_deterministic_and_subset_semantics(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(1000), pa.int64()),
                    "lang": pa.array(["en"] * 1000),
                }
            )
        )
        small = {r["doc_id"] for r in
                 stratified_sample(ds, "doc_id", "lang", {"en": "10"}).take_all()}
        big = {r["doc_id"] for r in
               stratified_sample(ds, "doc_id", "lang", {"en": "40"}).take_all()}
        assert small <= big  # prefix thresholds nest

    def test_mismatched_widths_rejected(self, ray_session):
        import pytest

        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1]), "lang": pa.array(["en"])})
        )
        with pytest.raises(ValueError):
            stratified_sample(ds, "doc_id", "lang", {"en": "1"}, "80")


class TestPivotCounts:
    def test_counts_per_category(self, ray_session):
        from duplicate_finder_ray.stages.relational import pivot_counts

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
                    "t": pa.array(["a", "a", "b", "b", "zz"]),
                }
            )
        )
        out = {
            r["u"]: (r["n_a"], r["n_b"])
            for r in pivot_counts(ds, "u", "t", ["a", "b"]).take_all()
        }
        # 'zz' is outside the category list and ignored
        assert out == {1: (2, 1), 2: (0, 1)}

    def test_rejects_empty_categories(self, ray_session):
        import pytest

        from duplicate_finder_ray.stages.relational import pivot_counts

        ds = ray.data.from_arrow(pa.table({"u": pa.array([1]), "t": pa.array(["a"])}))
        with pytest.raises(ValueError):
            pivot_counts(ds, "u", "t", [])


class TestGroupedRollup:
    def test_all_levels_consistent(self, ray_session):
        from duplicate_finder_ray.stages.relational import grouped_rollup

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "g1": pa.array(["x", "x", "y"]),
                    "g2": pa.array(["p", "q", "p"]),
                    "v": pa.array([1, 2, 4], pa.int64()),
                }
            )
        )
        out = {
            (r["g1"], r["g2"]): (r["n_rows"], r["sum_v"])
            for r in grouped_rollup(ds, ["g1", "g2"], "v").take_all()
        }
        assert out[("x", "p")] == (1, 1)
        assert out[("x", "q")] == (1, 2)
        assert out[("y", "p")] == (1, 4)
        assert out[("x", "ALL")] == (2, 3)
        assert out[("y", "ALL")] == (1, 4)
        assert out[("ALL", "ALL")] == (3, 7)
        assert len(out) == 6

    def test_rejects_empty_group_cols(self, ray_session):
        import pytest

        from duplicate_finder_ray.stages.relational import grouped_rollup

        ds = ray.data.from_arrow(pa.table({"v": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError):
            grouped_rollup(ds, [], "v")


def _typed_events(rows):
    """rows: (event_id, ts_us, user_id, event_type)"""
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


class TestDedupRetryEvents:
    @staticmethod
    def _oracle(rows, w):
        """LAG semantics: gap vs the previous same-(user,type) event,
        kept or not."""
        out = []
        prev_ts = {}
        for eid, ts, uid, ty in sorted(rows, key=lambda r: (r[2], r[3], r[1], r[0])):
            prev = prev_ts.get((uid, ty))
            gap = -1 if prev is None else ts - prev
            if prev is None or ts - prev > w:
                out.append((eid, uid, ty, ts, gap))
            prev_ts[(uid, ty)] = ts
        return sorted(out)

    def test_retries_dropped_types_isolated(self, ray_session):
        from duplicate_finder_ray.stages.events import dedup_retry_events

        w = 5_000_000
        rows = [
            (1, 0, 7, "click"),
            (2, 1_000_000, 7, "click"),      # retry: 1s after e1 -> drop
            (3, 2_000_000, 7, "purchase"),   # other type: kept
            (4, 7_500_000, 7, "click"),      # 6.5s after e2 (LAG!) -> kept
            (5, 0, 8, "click"),              # other user: kept
            (6, 5_000_000, 8, "click"),      # exactly w after e5 -> drop (> strict)
        ]
        got = sorted(
            (r["event_id"], r["user_id"], r["event_type"], r["ts_us"], r["gap_same_us"])
            for r in dedup_retry_events(_typed_events(rows), w, 4).take_all()
        )
        assert got == self._oracle(rows, w)
        kept_ids = [g[0] for g in got]
        assert kept_ids == [1, 3, 4, 5]

    def test_lag_not_debounce_semantics(self, ray_session):
        from duplicate_finder_ray.stages.events import dedup_retry_events

        # e2 dropped (1s after e1); e3 is 4s after e2 (dropped row) ->
        # LAG semantics also drops e3 even though it's 5s+ after e1
        rows = [(1, 0, 1, "x"), (2, 1_000_000, 1, "x"), (3, 5_000_000, 1, "x")]
        got = [
            r["event_id"]
            for r in dedup_retry_events(_typed_events(rows), 4_999_999, 2).take_all()
        ]
        assert sorted(got) == [1]

    def test_partition_count_invariant_matches_oracle(self, ray_session):
        from duplicate_finder_ray.stages.events import dedup_retry_events

        rng = np.random.default_rng(11)
        types = ["a", "b", "c"]
        rows = [
            (
                i,
                int(rng.integers(0, 30_000_000)),
                int(rng.integers(0, 6)),
                types[int(rng.integers(0, 3))],
            )
            for i in range(500)
        ]
        want = self._oracle(rows, 5_000_000)
        for parts in (2, 16):
            got = sorted(
                (r["event_id"], r["user_id"], r["event_type"], r["ts_us"], r["gap_same_us"])
                for r in dedup_retry_events(_typed_events(rows), 5_000_000, parts).take_all()
            )
            assert got == want

    def test_rejects_negative_window(self, ray_session):
        import pytest as _pytest

        from duplicate_finder_ray.stages.events import dedup_retry_events

        with _pytest.raises(ValueError):
            dedup_retry_events(_typed_events([(1, 0, 1, "x")]), -1)


class TestHourlyDense:
    def test_gap_fill_and_zero_hours(self, ray_session):
        from duplicate_finder_ray.stages.events import hourly_dense

        h = 3_600_000_000
        # events in hours 0, 0, 3 (hours 1-2 missing)
        rows = [(1, 100, 7, 0.0), (2, h - 1, 7, 0.0), (3, 3 * h + 5, 8, 0.0)]
        out = sorted(
            (r["hour_us"], r["n_events"])
            for r in hourly_dense(_events(rows)).take_all()
        )
        assert out == [(0, 2), (h, 0), (2 * h, 0), (3 * h, 1)]

    def test_empty_events(self, ray_session):
        from duplicate_finder_ray.stages.events import hourly_dense

        out = hourly_dense(_events([]))
        assert out.count() == 0


class TestSeasonalityProfile:
    def test_matches_datetime_oracle(self, ray_session):
        import datetime as dt
        from collections import defaultdict

        from duplicate_finder_ray.stages.events import seasonality_profile

        rng = np.random.default_rng(13)
        rows = []
        for i in range(300):
            ts = int(rng.integers(0, 40 * 86_400_000_000))
            rows.append((i, ts, 1, float(rng.integers(0, 10_000)) / 100.0))
        want_n = defaultdict(int)
        want_c = defaultdict(int)
        for _, ts, _, v in rows:
            d = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=ts)
            key = (d.isoweekday(), d.hour)
            want_n[key] += 1
            want_c[key] += int(np.floor(v * 100 + 0.5))
        got = {
            (r["dow"], r["hour"]): (r["n_events"], r["sum_value_cents"])
            for r in seasonality_profile(_events(rows)).take_all()
        }
        assert got == {k: (want_n[k], want_c[k]) for k in want_n}
