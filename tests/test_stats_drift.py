"""Gates for the A/B + drift family (stages/stats.py): Welch's t vs a
direct-formula oracle, PSI invariants (identical slices -> 0, shifted
slices -> large, empty-bucket clamp engaged)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from duplicate_finder_ray.stages.stats import psi_drift, welch_t


def test_welch_t_matches_direct_formula(ray_session):
    rng = np.random.default_rng(8)
    xa = rng.integers(50, 150, 400)
    xb = rng.integers(80, 220, 300)
    df = pd.DataFrame(
        {
            "g": ["a"] * len(xa) + ["b"] * len(xb),
            "x": np.r_[xa, xb],
        }
    )
    got = welch_t(ray.data.from_pandas(df), "g", "x", "a", "b").to_pandas()
    mx, my = xa.mean(), xb.mean()
    vx, vy = xa.var(ddof=1), xb.var(ddof=1)
    t = (mx - my) / np.sqrt(vx / len(xa) + vy / len(xb))
    assert got["n_a"].tolist() == [len(xa)]
    assert got["n_b"].tolist() == [len(xb)]
    # micro-quantized agreement with the classic formula (the engine's
    # fixed-order tree equals it to ~1 ulp; allow the boundary micro)
    assert abs(int(got["t_micro"].iloc[0]) - int(np.floor(t * 1e6 + 0.5))) <= 1
    assert int(got["t_micro"].iloc[0]) < 0  # b's mean is larger


def test_welch_t_degenerate_group(ray_session):
    df = pd.DataFrame({"g": ["a", "b", "b", "b"], "x": [5, 1, 2, 3]})
    got = welch_t(ray.data.from_pandas(df), "g", "x", "a", "b").to_pandas()
    assert got["t_micro"].tolist() == [0]  # n_a < 2 convention


def test_psi_identical_slices_is_zero(ray_session):
    vals = np.tile(np.arange(0, 320, 7), 4)
    df = pd.DataFrame(
        {"s": ["x"] * len(vals) + ["y"] * len(vals), "v": np.r_[vals, vals]}
    )
    got = psi_drift(ray.data.from_pandas(df), "s", "v", "x", "y", 16).to_pandas()
    assert got["psi_nano"].tolist() == [0]


def test_psi_shifted_distribution_is_large(ray_session):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 100, 500)
    b = rng.integers(200, 300, 500)  # fully disjoint buckets
    df = pd.DataFrame({"s": ["x"] * 500 + ["y"] * 500, "v": np.r_[a, b]})
    got = psi_drift(ray.data.from_pandas(df), "s", "v", "x", "y", 16).to_pandas()
    # every bucket empty on one side -> clamp engaged, PSI >> 0.25
    assert int(got["psi_nano"].iloc[0]) > 250_000_000


def test_psi_rejects_bad_width(ray_session):
    with pytest.raises(ValueError):
        psi_drift(ray.data.from_items([]), "s", "v", "x", "y", 0)


class TestChi2:
    def test_matches_direct_formula(self, ray_session):
        from duplicate_finder_ray.stages.stats import chi2_contingency

        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "r": rng.choice(["a", "b", "c"], 600),
                "c": rng.choice(["x", "y"], 600),
            }
        )
        got = chi2_contingency(ray.data.from_pandas(df), "r", "c").to_pandas()
        piv = df.groupby(["r", "c"]).size().unstack(fill_value=0)
        obs = piv.to_numpy(float)
        e = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
        chi2 = (((obs - e) ** 2) / e).sum()
        assert got["n"].tolist() == [600]
        assert got["dof"].tolist() == [2]
        # per-cell nano quantization vs one global sum: within
        # n_cells/2 nano of the direct float total
        assert abs(int(got["chi2_nano"].iloc[0]) - chi2 * 1e9) <= obs.size

    def test_independent_uniform_is_small(self, ray_session):
        from duplicate_finder_ray.stages.stats import chi2_contingency

        # perfectly independent: every (r, c) cell equal -> chi2 = 0
        df = pd.DataFrame(
            [(r, c) for r in "ab" for c in "xy" for _ in range(50)],
            columns=["r", "c"],
        )
        got = chi2_contingency(ray.data.from_pandas(df), "r", "c").to_pandas()
        assert got["chi2_nano"].tolist() == [0]

    def test_perfect_dependence_is_n(self, ray_session):
        from duplicate_finder_ray.stages.stats import chi2_contingency

        # 2x2 diagonal: chi2 = n exactly
        df = pd.DataFrame(
            [("a", "x")] * 40 + [("b", "y")] * 40, columns=["r", "c"]
        )
        got = chi2_contingency(ray.data.from_pandas(df), "r", "c").to_pandas()
        assert got["chi2_nano"].tolist() == [80 * 1_000_000_000]
