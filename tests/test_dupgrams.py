"""dup_ngram_stats tests — planted duplicated 13-grams + a brute-force
python oracle over the same md5 shingle family."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from duplicate_finder_ray.functions.shingles import Shingler
from duplicate_finder_ray.stages.textstats import dup_ngram_stats

SHARED = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november"


@pytest.fixture(scope="module")
def docs_df() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    rows = []
    # two docs sharing a >13-token sentence inside distinct noise
    for i in range(2):
        noise = " ".join(f"u{i}w{j}{rng.integers(100)}" for j in range(20))
        rows.append({"doc_id": i, "text": noise + " " + SHARED})
    # a unique doc, long enough to have grams
    rows.append({"doc_id": 2, "text": " ".join(f"only{j}" for j in range(30))})
    # too short: no 13-grams, must drop out
    rows.append({"doc_id": 3, "text": "short doc only five tokens here"})
    # an exact duplicate pair: every gram duplicated
    dup = " ".join(f"pair{j}" for j in range(25))
    rows.append({"doc_id": 4, "text": dup})
    rows.append({"doc_id": 5, "text": dup})
    return pd.DataFrame(rows)


def python_oracle(df: pd.DataFrame, n: int = 13) -> dict[int, tuple[int, int]]:
    sh = Shingler(k=n, token_hash="md5")
    sets = {r.doc_id: sh.shingle_set(r.text) for r in df.itertuples()}
    from collections import Counter

    owner = Counter()
    for s in sets.values():
        owner.update(s)
    return {
        d: (len(s), sum(1 for g in s if owner[g] >= 2))
        for d, s in sets.items()
        if s
    }


def test_matches_python_oracle_and_plants(ray_session, docs_df):
    out = {
        r["doc_id"]: (r["n_13grams"], r["n_dup_13grams"])
        for r in dup_ngram_stats(
            ray_session.data.from_pandas(docs_df), num_partitions=4
        ).take_all()
    }
    assert out == python_oracle(docs_df)
    # planted structure: the shared sentence gives docs 0/1 exactly the
    # SHARED-internal grams as duplicates (noise differs, so windows
    # crossing into noise are unique)
    n_shared_grams = len(SHARED.split()) - 12
    assert out[0][1] == n_shared_grams and out[1][1] == n_shared_grams
    assert out[2][1] == 0  # unique doc: none duplicated
    assert 3 not in out  # < 13 tokens: no grams
    # exact duplicates: every gram duplicated
    assert out[4][0] == out[4][1] == 25 - 12
    assert out[5] == out[4]


def test_deterministic_across_parallelism(ray_session, docs_df):
    a = sorted(
        tuple(r.values())
        for r in dup_ngram_stats(
            ray_session.data.from_pandas(docs_df).repartition(2),
            num_partitions=3,
        ).take_all()
    )
    b = sorted(
        tuple(r.values())
        for r in dup_ngram_stats(
            ray_session.data.from_pandas(docs_df).repartition(5),
            num_partitions=8,
        ).take_all()
    )
    assert a == b
