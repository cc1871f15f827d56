"""Novelty counts vs a brute-force Python oracle."""

from __future__ import annotations

import pandas as pd
import pytest


def _oracle(texts: dict[int, str], k: int):
    import re

    sets = {}
    for d, t in texts.items():
        toks = re.findall(r"[A-Za-z0-9_]+", t)
        if len(toks) < k:
            continue
        sets[d] = {
            "\x1f".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }
    df = {}
    for s in sets.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    return {
        d: (len(s), sum(1 for sh in s if df[sh] == 1))
        for d, s in sets.items()
    }


CORPUS = {
    1: "a b c d e f g",            # shares "a b c d e" with doc 2
    2: "a b c d e x y",
    3: "p q r s t u v",            # fully novel
    4: "too short",                # < 5 tokens: emits nothing
    5: "a b c d e f g",            # exact dup of 1: zero novelty
}


def test_novelty_matches_oracle(ray_session):
    import ray.data

    from duplicate_finder_ray.stages.novelty import novelty_counts

    df = pd.DataFrame({"doc_id": list(CORPUS), "text": list(CORPUS.values())})
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_unique"])
        for r in novelty_counts(
            ray.data.from_pandas(df).repartition(3), "doc_id", "text",
            k=5, num_partitions=4,
        ).take_all()
    }
    assert got == _oracle(CORPUS, 5)
    assert got[5][1] == 0  # the exact dup has zero unique shingles
    assert got[3] == (3, 3)  # fully novel doc


def test_novelty_rejects_bad_params(ray_session):
    import ray.data

    from duplicate_finder_ray.stages.novelty import novelty_counts

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        novelty_counts(ds, "doc_id", "text", k=0)
    with pytest.raises(ValueError):
        novelty_counts(ds, "doc_id", "text", num_partitions=0)
