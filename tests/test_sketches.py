"""Error-gate tests for the mergeable t-digest quantile sketch
(stages/sketches.py) against exact numpy/relational oracles — the same
accuracy-gating pattern as the HLL tests."""

import numpy as np
import pyarrow as pa

import ray.data

from duplicate_finder_ray.stages.sketches import (
    grouped_quantiles_sketch,
    tdigest_merge,
    tdigest_partial,
    tdigest_quantile,
)

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
#: relative-rank error bound at delta=500 (middle buckets are the
#: widest: ~4/delta; tails are far tighter under the k1 scale fn)
RANK_TOL = 0.01


def rank_error(values: np.ndarray, est: float, q: float) -> float:
    """|empirical CDF(est) - q| — rank error of one estimate."""
    s = np.sort(values)
    lo = np.searchsorted(s, est, side="left") / len(s)
    hi = np.searchsorted(s, est, side="right") / len(s)
    if lo <= q <= hi:  # estimate sits inside the tie run containing q
        return 0.0
    return min(abs(lo - q), abs(hi - q))


class TestTDigestKernel:
    def test_rank_error_lognormal(self):
        rng = np.random.default_rng(0)
        v = rng.lognormal(mean=3.0, sigma=2.0, size=100_000)
        m, w = tdigest_partial(v)
        est = tdigest_quantile(m, w, QS)
        for q, e in zip(QS, est):
            assert rank_error(v, e, q) <= RANK_TOL, (q, rank_error(v, e, q))

    def test_merge_matches_single_pass(self):
        # partition-invariance: 23 chunked partials merged == one
        # partial, within the rank bound (the associativity property
        # that makes the sketch distributable)
        rng = np.random.default_rng(1)
        v = rng.standard_normal(50_000) * 100.0
        parts = [tdigest_partial(c) for c in np.array_split(v, 23)]
        m, w = tdigest_merge(parts)
        assert len(m) <= 600  # bounded after merge, not 23x
        est = tdigest_quantile(m, w, QS)
        for q, e in zip(QS, est):
            assert rank_error(v, e, q) <= RANK_TOL

    def test_weight_conservation(self):
        rng = np.random.default_rng(2)
        v = rng.uniform(size=10_000)
        parts = [tdigest_partial(c) for c in np.array_split(v, 7)]
        m, w = tdigest_merge(parts)
        assert np.isclose(w.sum(), len(v))

    def test_constant_values(self):
        v = np.full(5_000, 42.5)
        m, w = tdigest_partial(v)
        est = tdigest_quantile(m, w, QS)
        assert np.allclose(est, 42.5)

    def test_tiny_input_near_exact(self):
        v = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        m, w = tdigest_partial(v)
        # fewer values than centroid budget: every value is its own
        # centroid; median is exact
        assert tdigest_quantile(m, w, [0.5])[0] == 3.0

    def test_empty(self):
        m, w = tdigest_partial(np.empty(0))
        assert len(m) == 0
        assert np.isnan(tdigest_quantile(m, w, [0.5])[0])


class TestGroupedQuantilesSketch:
    def test_vs_exact_oracle(self, ray_session):
        # gate the distributed sketch against the exact grouped
        # quantiles on per-group rank error
        rng = np.random.default_rng(3)
        langs = np.array(["py", "go", "rs"])[rng.integers(0, 3, 30_000)]
        vals = np.where(
            langs == "py",
            rng.lognormal(4, 1.5, 30_000),
            rng.standard_normal(30_000) * 50 + 200,
        )
        tbl = pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_chars": pa.array(vals.astype(np.int64), pa.int64()),
            }
        )
        ds = ray_session.data.from_arrow(tbl).repartition(9)
        got = {
            r["lang"]: (r["p50_x100"], r["p90_x100"])
            for r in grouped_quantiles_sketch(
                ds, "lang", "n_chars", [("p50_x100", 0.5), ("p90_x100", 0.9)]
            ).take_all()
        }
        assert set(got) == {"py", "go", "rs"}
        for lang in got:
            gvals = vals[langs == lang].astype(np.int64).astype(np.float64)
            for q, est_fp in zip([0.5, 0.9], got[lang]):
                assert rank_error(gvals, est_fp / 100.0, q) <= RANK_TOL

    def test_quality_prune_sketch_mode(self, ray_session):
        # the sketch-backed prune keeps ~the top (1-frac) of each group:
        # survivor fraction within the sketch's rank tolerance of exact
        import pandas as pd

        from duplicate_finder_ray.stages.textstats import quality_prune

        rng = np.random.default_rng(4)
        n = 4_000
        words = [
            " ".join(
                rng.choice(["the", "quick", "brown", "fox", "zap"], size=20)
            )
            for _ in range(n)
        ]
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": words,
                "lang": np.array(["en", "de"])[rng.integers(0, 2, n)],
            }
        )
        ds = ray_session.data.from_pandas(df).repartition(5)
        exact = quality_prune(ds, frac=0.5, use_sketch=False).count()
        sketch = quality_prune(ds, frac=0.5, use_sketch=True).count()
        assert abs(sketch - exact) / n <= 2 * RANK_TOL + 0.01
