"""Count-Min Sketch gates (stages/cms.py): never-undercount, the
e·N/width overcount bound on a collision-forcing corpus, exactness
when width is non-binding, and partial/merge == single-pass."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from duplicate_finder_ray.stages.cms import (
    cms_build,
    cms_from_counts,
    cms_point_counts,
    cms_query,
)


def _zipf_corpus(vocab: int, n_docs: int, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    rows = []
    for i in range(n_docs):
        words = rng.choice(vocab, size=40, p=p)
        rows.append({"text": " ".join(f"tok{w}" for w in words)})
    return pd.DataFrame(rows)


def _true_counts(df: pd.DataFrame) -> dict[str, int]:
    from collections import Counter

    c: Counter = Counter()
    for t in df["text"]:
        c.update(t.split())
    return dict(c)


def test_exact_when_width_non_binding(ray_session):
    df = _zipf_corpus(vocab=50, n_docs=200)
    truth = _true_counts(df)
    toks = sorted(truth)
    got = cms_point_counts(
        ray.data.from_pandas(df), "text", toks, depth=4, width=4096
    ).to_pandas()
    assert dict(zip(got["token"], got["est_n"])) == truth


def test_collision_regime_bound(ray_session):
    # vocab 5000 >> width 64: collisions guaranteed in every row
    df = _zipf_corpus(vocab=5000, n_docs=300, seed=9)
    truth = _true_counts(df)
    total = sum(truth.values())
    toks = sorted(truth)[:500]
    got = cms_point_counts(
        ray.data.from_pandas(df), "text", toks, depth=4, width=64
    ).to_pandas()
    err = np.array([int(e) - truth[t] for t, e in zip(got["token"], got["est_n"])])
    assert (err >= 0).all()  # CMS never undercounts
    # classic bound eps = e/width per query w.h.p.; assert the MEAN
    # overcount clears it with slack (deterministic: fixed hash keys)
    assert err.mean() <= np.e * total / 64


def test_merge_equals_single_pass(ray_session):
    df = _zipf_corpus(vocab=300, n_docs=120, seed=5)
    truth = _true_counts(df)
    toks = np.asarray(sorted(truth), dtype=object)
    counts = np.asarray([truth[t] for t in toks], dtype=np.int64)
    single = cms_from_counts(toks, counts, depth=4, width=128)
    # distributed build over many small blocks must produce the SAME
    # matrix (linearity of the sketch)
    ds = ray.data.from_pandas(df).repartition(10)
    distributed = cms_build(ds, "text", depth=4, width=128)
    assert (single == distributed).all()
    assert (cms_query(distributed, toks) >= counts).all()


def test_empty_and_bad_params(ray_session):
    import pyarrow as pa

    empty = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    sk = cms_build(empty, "text", depth=2, width=16)
    assert sk.shape == (2, 16) and sk.sum() == 0
    assert cms_query(sk, np.asarray([], dtype=object)).tolist() == []
    with pytest.raises(ValueError):
        cms_build(empty, "text", depth=0, width=16)
