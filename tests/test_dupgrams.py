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


class TestUnigramXent:
    def test_matches_python_oracle(self, ray_session):
        import math
        import re
        from collections import Counter

        from duplicate_finder_ray.stages.textstats import unigram_xent

        texts = {
            0: "the cat sat on the mat",
            1: "the dog sat on the log",
            2: "zq xv qqj unique salad words here",
            3: "",  # no tokens: dropped
        }
        df = pd.DataFrame(
            [{"doc_id": k, "text": v} for k, v in texts.items()]
        )
        out = {
            r["doc_id"]: (r["n_tokens"], r["xent"])
            for r in unigram_xent(
                ray_session.data.from_pandas(df), num_partitions=3
            ).take_all()
        }
        toks = {k: re.findall(r"[A-Za-z0-9_]+", v) for k, v in texts.items()}
        global_c = Counter(t for ts in toks.values() for t in ts)
        nn, vv = sum(global_c.values()), len(global_c)
        for k, ts in toks.items():
            if not ts:
                assert k not in out
                continue
            want = math.log(nn + vv) - sum(
                math.log(global_c[t] + 1) for t in ts
            ) / len(ts)
            got_n, got_x = out[k]
            assert got_n == len(ts)
            assert abs(got_x - want) < 1e-9
        # rare-token salad must score above stopword-dense prose
        assert out[2][1] > out[0][1]

    def test_deterministic_counts_across_parallelism(self, ray_session):
        from duplicate_finder_ray.stages.textstats import unigram_xent

        df = pd.DataFrame(
            [{"doc_id": i, "text": f"w{i % 7} common token w{i % 3}"}
             for i in range(60)]
        )
        a = sorted(
            (r["doc_id"], r["n_tokens"], round(r["xent"], 9))
            for r in unigram_xent(
                ray_session.data.from_pandas(df).repartition(2),
                num_partitions=4,
            ).take_all()
        )
        b = sorted(
            (r["doc_id"], r["n_tokens"], round(r["xent"], 9))
            for r in unigram_xent(
                ray_session.data.from_pandas(df).repartition(7),
                num_partitions=9,
            ).take_all()
        )
        assert a == b


class TestDuplicatedPassages:
    def test_planted_shared_span(self, ray_session):
        from duplicate_finder_ray.stages.textstats import duplicated_passages

        # docs 0/1 share a 14-token sentence embedded in unique noise;
        # tokens 21..34 (1-based) of each doc are the shared region
        noise_a = " ".join(f"na{j}" for j in range(20))
        noise_b = " ".join(f"nb{j}" for j in range(20))
        tail_a = " ".join(f"ta{j}" for j in range(15))
        tail_b = " ".join(f"tb{j}" for j in range(15))
        df = pd.DataFrame(
            [
                {"doc_id": 0, "text": f"{noise_a} {SHARED} {tail_a}"},
                {"doc_id": 1, "text": f"{noise_b} {SHARED} {tail_b}"},
                {"doc_id": 2, "text": " ".join(f"z{j}" for j in range(40))},
            ]
        )
        out = duplicated_passages(
            ray_session.data.from_pandas(df), num_partitions=4
        ).take_all()
        spans = {(r["doc_id"]): (r["start_tok"], r["end_tok"], r["span_tokens"]) for r in out}
        n_sh = len(SHARED.split())
        # only the shared 14 tokens are covered (windows crossing into
        # noise are unique): one span per doc, exactly the shared region
        assert spans[0] == (21, 20 + n_sh, n_sh)
        assert spans[1] == (21, 20 + n_sh, n_sh)
        assert 2 not in spans
        assert len(out) == 2

    def test_exact_dup_docs_fully_covered(self, ray_session):
        from duplicate_finder_ray.stages.textstats import duplicated_passages

        text = " ".join(f"w{j}" for j in range(30))
        df = pd.DataFrame(
            [{"doc_id": 0, "text": text}, {"doc_id": 1, "text": text}]
        )
        out = duplicated_passages(
            ray_session.data.from_pandas(df), num_partitions=3
        ).take_all()
        for r in out:
            assert (r["start_tok"], r["end_tok"], r["span_tokens"]) == (1, 30, 30)
        assert len(out) == 2


class TestLeakageFreeSplit:
    def test_clusters_move_together_and_cover_all(self, ray_session, tmp_path):
        """Every file appears exactly once; all members of a component
        share one split; singletons get their own component."""
        import os

        import duckdb

        # synthesize a tiny documents.parquet whose derived code files
        # contain planted near-dup groups (shared word salad) and
        # unique docs
        rng = np.random.default_rng(7)
        rows = []
        for i in range(20):
            if i % 4 == 0 and i + 1 < 20:
                # per-pair base: each pair is ITS OWN near-dup cluster
                base = " ".join(f"p{i}tok{j}" for j in range(60))
                rows.append({"doc_id": i, "text": base + f" v{i}"})
                rows.append({"doc_id": i + 1000, "text": base + f" w{i}"})
            rows.append(
                {
                    "doc_id": i + 2000,
                    "text": " ".join(
                        f"u{i}x{j}{rng.integers(99)}" for j in range(40)
                    ),
                }
            )
        df = pd.DataFrame(rows)
        df["lang"] = "en"
        sf = str(tmp_path)
        df.to_parquet(os.path.join(sf, "documents.parquet"))

        from duplicate_finder_ray.pipelines.queries import QUERIES

        out = QUERIES["leakage_free_split"](sf).to_pandas()
        assert len(out) == out["file_id"].nunique() == len(df)
        per_comp = out.groupby("component")["split"].nunique()
        assert (per_comp == 1).all()
        # the planted near-dup pairs landed in shared components
        multi = out.groupby("component").size()
        assert (multi >= 2).sum() >= 5
        assert set(out["split"]) <= {"train", "val", "test"}


class TestCorpusDiversity:
    def test_counts_match_python(self, ray_session):
        from duplicate_finder_ray.functions.shingles import Shingler
        from duplicate_finder_ray.stages.textstats import corpus_diversity

        texts = [
            "a b c a b c",            # heavy repetition
            "d e f g h i j",          # all unique
            "a b x y z",
        ]
        df = pd.DataFrame(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        )
        out = {
            r["n"]: (r["total_ngrams"], r["distinct_ngrams"], r["distinct_ppm"])
            for r in corpus_diversity(
                ray_session.data.from_pandas(df), num_partitions=3
            ).to_pylist()
        }
        for n in (1, 2, 3):
            sh = Shingler(k=n, token_hash="md5")
            all_h = []
            for t in texts:
                ids = sh._ids(sh.units(t))
                m = len(ids) - n + 1
                if m <= 0:
                    continue
                import numpy as _np

                h = ids[:m].copy()
                from duplicate_finder_ray.functions.shingles import _MIX

                with _np.errstate(over="ignore"):
                    for j in range(1, n):
                        h = (h * _MIX) ^ ids[j : m + j]
                all_h.append(h)
            flat = np.concatenate(all_h)
            want = (
                len(flat),
                len(np.unique(flat)),
                len(np.unique(flat)) * 1_000_000 // len(flat),
            )
            assert out[n] == want
        # repetition must show: unigram diversity < 1e6 ppm
        assert out[1][2] < 1_000_000


class TestSourceMixSample:
    def test_equal_share_rebalance(self, ray_session, tmp_path):
        """Skewed groups downsample toward the smallest group's size;
        the smallest group is kept whole; keep decisions are
        deterministic md5 (rerun-identical)."""
        import os

        rows = []
        for i in range(300):
            rows.append({"doc_id": i, "lang": "big", "text": "x"})
        for i in range(300, 400):
            rows.append({"doc_id": i, "lang": "mid", "text": "x"})
        for i in range(400, 440):
            rows.append({"doc_id": i, "lang": "small", "text": "x"})
        df = pd.DataFrame(rows)
        df["source"] = "s"
        df["n_chars"] = 1
        sf = str(tmp_path)
        df.to_parquet(os.path.join(sf, "documents.parquet"))

        from duplicate_finder_ray.pipelines.queries import QUERIES

        out = QUERIES["source_mix_sample"](sf).to_pandas()
        by = out.groupby("lang").size()
        assert by["small"] == 40  # smallest group kept whole
        # md5 rate sampling: expected 40 per group, binomial spread
        assert 20 <= by["big"] <= 60 and 25 <= by["mid"] <= 58
        again = QUERIES["source_mix_sample"](sf).to_pandas()
        assert sorted(out["doc_id"]) == sorted(again["doc_id"])


class TestCosineThresholdSweep:
    def test_monotone_and_consistent_with_pairs(self, ray_session):
        from duplicate_finder_ray.pipelines.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        sweep = {
            r["threshold_ppm"]: r["n_pairs"]
            for r in QUERIES["cosine_threshold_sweep"](sf).take_all()
        }
        ts = sorted(sweep)
        assert ts[0] == 300_000 and ts[-1] == 800_000 and len(ts) == 11
        # counts must be non-increasing in the threshold
        assert all(sweep[a] >= sweep[b] for a, b in zip(ts, ts[1:]))
        # consistency with the pair query at 0.4
        n_04 = QUERIES["embedding_cosine_pairs"](sf).count()
        # embedding_cosine_pairs restricts to vec_id%10==0 endpoints;
        # the sweep does not — so sweep count at 0.4 must be >= that
        assert sweep[400_000] >= n_04
