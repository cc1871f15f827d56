"""snapshot_diff / table_fingerprint / key_skew_report edge cases."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from duplicate_finder_ray.stages.diagnostics import (
    snapshot_diff,
    table_fingerprint,
)


class TestSnapshotDiff:
    def test_all_statuses(self, ray_session):
        left = pd.DataFrame(
            {
                "repo": ["r1", "r1", "r2", "r2"],
                "path": ["a", "b", "c", "d"],
                "sha256": ["1", "2", "3", "4"],
            }
        )
        right = pd.DataFrame(
            {
                # a unchanged, b changed, c removed (absent), e added
                "repo": ["r1", "r1", "r2", "r3"],
                "path": ["a", "b", "d", "e"],
                "sha256": ["1", "22", "4", "5"],
            }
        )
        got = snapshot_diff(
            ray_session.data.from_pandas(left).repartition(2),
            ray_session.data.from_pandas(right).repartition(2),
            ["repo", "path"],
            "sha256",
            num_partitions=4,
        ).to_pandas()
        want = {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}
        assert dict(zip(got["status"], got["n_keys"])) == want

    def test_zero_statuses_omitted(self, ray_session):
        same = pd.DataFrame({"k": ["x"], "v": ["1"]})
        got = snapshot_diff(
            ray_session.data.from_pandas(same),
            ray_session.data.from_pandas(same),
            ["k"],
            "v",
        ).to_pandas()
        assert dict(zip(got["status"], got["n_keys"])) == {"unchanged": 1}

    def test_duplicate_key_raises(self, ray_session):
        dup = pd.DataFrame({"k": ["x", "x"], "v": ["1", "2"]})
        ok = pd.DataFrame({"k": ["x"], "v": ["1"]})
        with pytest.raises(Exception, match="duplicate key"):
            snapshot_diff(
                ray_session.data.from_pandas(dup),
                ray_session.data.from_pandas(ok),
                ["k"],
                "v",
            ).materialize()

    def test_rejects_bad_params(self, ray_session):
        ds = ray_session.data.from_pandas(pd.DataFrame({"k": ["x"], "v": ["1"]}))
        with pytest.raises(ValueError):
            snapshot_diff(ds, ds, [], "v")
        with pytest.raises(ValueError):
            snapshot_diff(ds, ds, ["k"], "v", num_partitions=0)


class TestTableFingerprint:
    @staticmethod
    def _oracle(df: pd.DataFrame, cols) -> int:
        total = 0
        for _, row in df.iterrows():
            s = "\x1f".join(str(row[c]) for c in cols)
            total += int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        return format(total % (1 << 64), "016x")

    def test_matches_oracle_and_order_insensitive(self, ray_session):
        df = pd.DataFrame({"a": ["x", "y", "z", "w"], "b": [1, 2, 3, 4]})
        got = table_fingerprint(
            ray_session.data.from_pandas(df).repartition(3), ["a", "b"]
        ).to_pandas()
        assert len(got) == 1
        assert got.iloc[0]["n_rows"] == 4
        assert got.iloc[0]["fingerprint"] == self._oracle(df, ["a", "b"])
        # permuted rows -> identical fingerprint
        perm = df.iloc[[2, 0, 3, 1]].reset_index(drop=True)
        got2 = table_fingerprint(
            ray_session.data.from_pandas(perm), ["a", "b"]
        ).to_pandas()
        assert got2.iloc[0]["fingerprint"] == got.iloc[0]["fingerprint"]
        # a changed value -> different fingerprint
        df3 = df.assign(b=[1, 2, 3, 5])
        got3 = table_fingerprint(
            ray_session.data.from_pandas(df3), ["a", "b"]
        ).to_pandas()
        assert got3.iloc[0]["fingerprint"] != got.iloc[0]["fingerprint"]

    def test_rejects_bad_params(self, ray_session):
        ds = ray_session.data.from_pandas(pd.DataFrame({"a": ["x"]}))
        with pytest.raises(ValueError):
            table_fingerprint(ds, [])
