"""BM25 gates (stages/ir.py): scores must equal a direct-formula
Python oracle on a planted corpus, ranks must follow the quantized
score with id tie-break, and degenerate inputs must behave."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import ray.data

from duplicate_finder_ray.stages.ir import B, K1, bm25_topk


def _oracle(df: pd.DataFrame, terms: list[str], topk: int):
    toks = [t.split() for t in df["text"]]
    dl = [len(t) for t in toks]
    n = len(df)
    avgdl = float(sum(dl)) / float(n)
    out = []
    for i, (doc_id, tok) in enumerate(zip(df["doc_id"], toks)):
        score = 0.0
        for term in terms:
            tf = float(tok.count(term))
            dfreq = sum(1 for t in toks if term in t)
            idf = math.log(1.0 + (float(n) - dfreq + 0.5) / (dfreq + 0.5))
            score = score + (idf * (tf * (K1 + 1.0))) / (
                tf + K1 * ((1.0 - B) + B * (dl[i] / avgdl))
            )
        micro = int(np.floor(score * 1_000_000.0 + 0.5))
        if micro > 0:
            out.append((doc_id, micro))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:topk]


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    rng = np.random.default_rng(13)
    vocab = ["alpha", "beta", "gamma", "delta", "rare"]
    rows = []
    for i in range(50):
        words = list(rng.choice(vocab[:4], size=rng.integers(5, 30)))
        if i % 7 == 0:
            words += ["rare"] * (i % 3 + 1)
        rows.append({"doc_id": i, "text": " ".join(words)})
    rows.append({"doc_id": 98, "text": ""})
    rows.append({"doc_id": 99, "text": "unrelated words only"})
    return pd.DataFrame(rows)


def test_bm25_matches_python_oracle(ray_session, corpus):
    terms = ["rare", "alpha"]
    got = (
        bm25_topk(ray.data.from_pandas(corpus), "doc_id", "text", terms, topk=15)
        .to_pandas()
        .sort_values("rank")
    )
    expect = _oracle(corpus, terms, 15)
    assert list(zip(got["doc_id"], got["score_micro"])) == expect
    assert got["rank"].tolist() == list(range(1, len(expect) + 1))


def test_bm25_no_match_is_empty(ray_session, corpus):
    got = bm25_topk(
        ray.data.from_pandas(corpus), "doc_id", "text", ["zzz"], topk=5
    ).to_pandas()
    assert len(got) == 0


def test_bm25_rejects_bad_params(ray_session, corpus):
    ds = ray.data.from_pandas(corpus)
    with pytest.raises(ValueError):
        bm25_topk(ds, "doc_id", "text", [], topk=5)
    with pytest.raises(ValueError):
        bm25_topk(ds, "doc_id", "text", ["a", "a"], topk=5)
    with pytest.raises(ValueError):
        bm25_topk(ds, "doc_id", "text", ["a"], topk=0)


class TestBooleanSearch:
    def test_and_not_semantics(self, ray_session):
        from duplicate_finder_ray.stages.ir import docs_with_all_terms

        df = pd.DataFrame(
            [
                {"doc_id": 1, "text": "cat dog cat"},     # both, no bird -> in
                {"doc_id": 2, "text": "cat dog bird"},    # excluded by bird
                {"doc_id": 3, "text": "cat only here"},   # missing dog
                {"doc_id": 4, "text": "dog dog cat dog"}, # in, tf (1, 3)
                {"doc_id": 5, "text": ""},
            ]
        )
        got = (
            docs_with_all_terms(
                ray.data.from_pandas(df), "doc_id", "text", ["cat", "dog"], ["bird"]
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert got["doc_id"].tolist() == [1, 4]
        assert got["tf_0"].tolist() == [2, 1]  # cat counts
        assert got["tf_1"].tolist() == [1, 3]  # dog counts

    def test_rejects_bad_terms(self, ray_session):
        from duplicate_finder_ray.stages.ir import docs_with_all_terms

        ds = ray.data.from_pandas(pd.DataFrame([{"doc_id": 1, "text": "x"}]))
        with pytest.raises(ValueError):
            docs_with_all_terms(ds, "doc_id", "text", [])
        with pytest.raises(ValueError):
            docs_with_all_terms(ds, "doc_id", "text", ["a"], ["a"])


class TestRRF:
    def test_fusion_math_and_missing_ranks(self, ray_session):
        from duplicate_finder_ray.stages.ir import rrf_fuse

        a = ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1, 2, 3], "rank": [1, 2, 3]})
        )
        b = ray.data.from_pandas(
            pd.DataFrame({"vid": [2, 4], "rank": [1, 2]})
        )
        got = (
            rrf_fuse([(a, "doc_id"), (b, "vid")], topk=10)
            .to_pandas()
            .sort_values("rank")
        )

        def micro(*ranks):
            import numpy as np

            s = 0.0
            for r in ranks:
                s = s + (1.0 / (60 + r) if r else 0.0)
            return int(np.floor(s * 1_000_000.0 + 0.5))

        expect = {
            1: micro(1, 0),
            2: micro(2, 1),
            3: micro(3, 0),
            4: micro(0, 2),
        }
        assert dict(zip(got["doc_id"], got["rrf_micro"])) == expect
        # doc 2 appears in both rankings -> fused rank 1
        assert got.iloc[0]["doc_id"] == 2
        assert got["rank"].tolist() == [1, 2, 3, 4]

    def test_rejects_bad_params(self, ray_session):
        from duplicate_finder_ray.stages.ir import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse([], topk=5)
        with pytest.raises(ValueError):
            rrf_fuse([(ray.data.from_items([]), "id")], topk=0)
