"""Unit tests for stages/profile.py — null handling, typed min/max
ordering (the '10' < '9' trap), exact distinct counts, type gating."""

import pyarrow as pa
import pytest

import ray.data

from duplicate_finder_ray.stages.profile import profile_table


def _ds(d: dict, schema=None) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table(d, schema=schema))


class TestProfileTable:
    def test_counts_nulls_minmax_distinct(self):
        ds = _ds(
            {
                "i": pa.array([9, 10, None, 2, 10], pa.int64()),
                "s": pa.array(["b", None, "a", "a", None]),
            }
        ).repartition(3)
        got = {
            r["col_name"]: r
            for r in profile_table(
                ds, ["i", "s"], n_salts=2, parts_per_salt=2
            ).take_all()
        }
        i = got["i"]
        # native min/max BEFORE stringify: min 2 / max 10, not '10' < '9'
        assert (i["n_rows"], i["n_null"], i["n_distinct"]) == (5, 1, 3)
        assert (i["min_value"], i["max_value"]) == ("2", "10")
        s = got["s"]
        assert (s["n_rows"], s["n_null"], s["n_distinct"]) == (5, 2, 2)
        assert (s["min_value"], s["max_value"]) == ("a", "b")

    def test_all_null_column(self):
        ds = _ds(
            {"x": pa.array([None, None], pa.string()),
             "y": pa.array([1, 2], pa.int64())}
        )
        got = {
            r["col_name"]: r for r in profile_table(ds, ["x", "y"]).take_all()
        }
        x = got["x"]
        assert (x["n_rows"], x["n_null"], x["n_distinct"]) == (2, 2, 0)
        assert x["min_value"] is None and x["max_value"] is None

    def test_rejects_unsupported_and_missing(self):
        ds = _ds({"f": pa.array([1.5]), "i": pa.array([1], pa.int64())})
        with pytest.raises(ValueError):
            profile_table(ds, ["f"])
        with pytest.raises(ValueError):
            profile_table(ds, ["nope"])
        with pytest.raises(ValueError):
            profile_table(ds, [])
