"""Paragraph (token-window) exact dedup vs a brute-force Python oracle."""

from __future__ import annotations

import pandas as pd
import pytest


def _oracle(texts: dict[int, str], w: int):
    """First-occurrence window dedup, pure Python."""
    seen: set[str] = set()
    out = {}
    for doc_id in sorted(texts):
        toks = texts[doc_id].split()
        if not toks:
            continue
        windows = [
            " ".join(toks[i : i + w]) for i in range(0, len(toks), w)
        ]
        kept = []
        for win in windows:
            if win not in seen:
                seen.add(win)
                kept.append(win)
        if kept:
            out[doc_id] = (len(windows), len(kept), " ".join(kept))
    return out


CORPUS = {
    1: "a b c d e f g h i j",          # windows: "a..h", "i j"
    2: "a b c d e f g h x y",          # first window duplicates doc 1's
    3: "i j",                           # whole doc already seen
    4: "",                              # empty: emits nothing
    5: "q r s t u v w x y z a a",      # all fresh
    6: "q r s t u v w x y z a a",      # exact dup of doc 5: fully removed
}


@pytest.mark.parametrize("window", [4, 8])
def test_paragraph_dedup_matches_oracle(ray_session, window):
    import ray.data

    from duplicate_finder_ray.stages.paradedup import paragraph_dedup

    df = pd.DataFrame(
        {"doc_id": list(CORPUS), "text": list(CORPUS.values())}
    )
    ds = ray.data.from_pandas(df).repartition(3)
    got = (
        paragraph_dedup(ds, "doc_id", "text", window_tokens=window,
                        num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _oracle(CORPUS, window)
    assert list(got["doc_id"]) == sorted(want)
    for _, row in got.iterrows():
        n_chunks, n_kept, text = want[row["doc_id"]]
        assert row["n_chunks"] == n_chunks
        assert row["n_kept"] == n_kept
        assert row["text_dedup"] == text


def test_paragraph_dedup_fully_deduped_docs_drop(ray_session):
    import ray.data

    from duplicate_finder_ray.stages.paradedup import paragraph_dedup

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["x y z", "x y z"]})
    got = paragraph_dedup(
        ray.data.from_pandas(df), "doc_id", "text", window_tokens=8
    ).to_pandas()
    assert list(got["doc_id"]) == [1]
    assert got.loc[0, "text_dedup"] == "x y z"


def test_paragraph_dedup_rejects_bad_params(ray_session):
    import ray.data

    from duplicate_finder_ray.stages.paradedup import paragraph_dedup

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        paragraph_dedup(ds, "doc_id", "text", window_tokens=0)
    with pytest.raises(ValueError):
        paragraph_dedup(ds, "doc_id", "text", num_partitions=0)
