"""Oracle tests for the prefix-filtered exact set-similarity join
(stages/ppjoin.py): the pair set must EQUAL brute-force Jaccard truth
(zero false negatives is the operator's contract), and the prefix
length math must be sound for every (n, tau)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.stages.neardup import ascii_shingle_hashes
from duplicate_finder_ray.stages.ppjoin import ppjoin_pairs, prefix_lengths


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(80):
        words = list(rng.choice(vocab, size=28))
        rows.append({"file_id": f"d{i:04d}", "content": " ".join(words)})
        if i % 4 == 0:
            rows.append({"file_id": f"c{i:04d}", "content": " ".join(words)})
            v = words.copy()
            v[5], v[20] = "xxx", "yyy"
            rows.append({"file_id": f"e{i:04d}", "content": " ".join(v)})
    rows.append({"file_id": "empty", "content": ""})
    rows.append({"file_id": "short", "content": "one two"})
    return pd.DataFrame(rows)


def brute_pairs(df: pd.DataFrame, k: int, tau: float) -> set[tuple[str, str, int, int]]:
    sets = {
        r.file_id: set(ascii_shingle_hashes(r.content, k).tolist())
        for r in df.itertuples()
    }
    keys = sorted(sets)
    out = set()
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa and not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if union and inter / union >= tau:
                out.add((a, b, inter, union))
    return out


@pytest.mark.parametrize("tau", [0.5, 0.8])
def test_ppjoin_equals_brute_force(ray_session, corpus, tau):
    cfg = PipelineConfig(jaccard_threshold=tau)
    ds = ray.data.from_pandas(corpus)
    got = ppjoin_pairs(ds, cfg).to_pandas()
    got_set = {
        (r.a, r.b, int(r.n_inter), int(r.n_union)) for r in got.itertuples()
    }
    assert got_set == brute_pairs(corpus, cfg.shingle_k, tau)


def test_prefix_lengths_sound():
    """For every (n, tau) grid point the prefix must be long enough
    that two sets of sizes (na, nb) with jaccard >= tau are guaranteed
    to collide: plen >= n - ceil(tau * n) + 1 and >= 1 for n > 0."""
    for tau in (0.3, 0.5, 0.7, 0.8, 0.9, 1.0):
        n = np.arange(0, 200)
        plen = prefix_lengths(n, tau)
        t = np.maximum(np.ceil(tau * n - 1e-9).astype(np.int64), 1)
        assert (plen[n > 0] >= (n - t + 1)[n > 0]).all()
        assert (plen[n > 0] >= 1).all()
        assert plen[0] == 0
        # overlap lower bound t never exceeds the set size
        assert (t[n > 0] <= n[n > 0]).all()


def test_ppjoin_rejects_bad_tau(ray_session):
    with pytest.raises(ValueError):
        from duplicate_finder_ray.stages.ppjoin import prefix_filter_candidates

        prefix_filter_candidates(
            ray.data.from_items([]), PipelineConfig(jaccard_threshold=0.0)
        )
