"""Gates for the storage-layout pair (stages/layout.py): the Morton
interleave vs a per-bit reference, ordering vs a Python z-sort, and
zone-map partition invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from duplicate_finder_ray.stages.layout import morton_key, zone_maps, zorder_rank


def _morton_slow(x: int, y: int) -> int:
    z = 0
    for b in range(31):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_morton_matches_bitwise_reference():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 2**31, 200)
    y = rng.integers(0, 2**31, 200)
    fast = morton_key(x, y)
    assert fast.tolist() == [_morton_slow(int(a), int(b)) for a, b in zip(x, y)]
    assert (fast >= 0).all()  # signed-64-safe for the SQL twin


def test_zorder_rank_is_z_sorted(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "id": np.arange(300, dtype=np.int64),
            "x": rng.integers(0, 1000, 300),
            "y": rng.integers(0, 1000, 300),
        }
    )
    got = (
        zorder_rank(ray.data.from_pandas(df), "x", "y", "id", num_partitions=8)
        .to_pandas()
        .sort_values("rnk")
    )
    expect = sorted(
        df.itertuples(index=False),
        key=lambda r: (_morton_slow(int(r.x), int(r.y)), r.id),
    )
    assert got["id"].tolist() == [r.id for r in expect]
    assert got["rnk"].tolist() == list(range(300))


def test_zone_maps_partition_and_tighten(ray_session):
    rng = np.random.default_rng(2)
    n = 256
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "x": rng.integers(0, 64, n),
            "y": rng.integers(0, 64, n),
        }
    )
    zm = (
        zone_maps(ray.data.from_pandas(df), "x", "y", "id", zone_rows=32)
        .to_pandas()
        .sort_values("zone")
    )
    assert zm["n_rows"].sum() == n
    assert (zm["n_rows"] == 32).all()  # 256 / 32 exact zones
    assert (zm["min_x"] <= zm["max_x"]).all()
    # z-ordering keeps BOTH dims locally tight: the mean per-zone x
    # range must be well under the global range (the skipping win)
    assert (zm["max_x"] - zm["min_x"]).mean() < (df["x"].max() - df["x"].min())
    with pytest.raises(ValueError):
        zone_maps(ray.data.from_pandas(df), "x", "y", "id", zone_rows=0)
