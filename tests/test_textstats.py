"""Text-analysis tests: quality metrics vs a pure-python oracle,
language-ID behavior, winnowing fingerprint guarantees."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from duplicate_finder_ray.stages import textstats

DOCS = [
    "The quick brown fox jumps over the lazy dog. It is a fine day!",
    "der hund und die katze sind in den garten von dem haus",
    "le chat et le chien sont dans la maison avec les enfants",
    "en la casa de el perro y el gato con una luz para todos",
    "",
    "   \n\t  ",
    "x" * 50,
    "1234567890 !!! ??? ### $$$ 42 17",
    "naturally the text of a long document is that it has stopwords "
    "and it is for the most part prose with a few marks.",
]


def batch_of(texts) -> pa.Table:
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )


class TestQualityScores:
    def test_counts_match_python_oracle(self):
        out = textstats.quality_scores(batch_of(DOCS)).to_pandas()
        for i, t in enumerate(DOCS):
            row = out.iloc[i]
            assert row["n_chars"] == len(t)
            words = t.split()
            assert row["n_words"] == len(words)
            assert row["n_punct"] == len(re.findall(r"[!-/:-@\[-`{-~]", t))
            assert row["n_digits"] == len(re.findall(r"[0-9]", t))
            stop = len(
                re.findall(textstats.STOPWORD_REGEX.replace("(?i)", ""), t, re.I)
            )
            assert row["n_stopwords"] == stop

    def test_score_ranges_and_ordering(self):
        out = textstats.quality_scores(batch_of(DOCS)).to_pandas()
        assert ((out["quality_score"] >= 0) & (out["quality_score"] <= 1)).all()
        # prose beats digit/punct walls and letter runs
        prose = out.iloc[8]["quality_score"]
        assert prose > out.iloc[7]["quality_score"]
        assert prose > out.iloc[6]["quality_score"]

    def test_empty_doc_is_zero(self):
        out = textstats.quality_scores(batch_of(DOCS)).to_pandas()
        assert out.iloc[4]["n_words"] == 0
        assert out.iloc[4]["quality_score"] == 0.0


class TestLanguageId:
    def test_marker_languages_detected(self):
        out = textstats.language_id(batch_of(DOCS)).to_pandas()
        assert out.iloc[0]["lang_pred"] == "en"
        assert out.iloc[1]["lang_pred"] == "de"
        assert out.iloc[2]["lang_pred"] == "fr"
        assert out.iloc[3]["lang_pred"] == "es"

    def test_empty_and_junk_unknown(self):
        out = textstats.language_id(batch_of(DOCS)).to_pandas()
        assert out.iloc[4]["lang_pred"] == "unknown"
        assert out.iloc[5]["lang_pred"] == "unknown"
        assert out.iloc[6]["lang_pred"] == "unknown"

    def test_deterministic(self):
        a = textstats.language_id(batch_of(DOCS)).to_pandas()
        b = textstats.language_id(batch_of(DOCS)).to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestWinnowing:
    def test_shared_substring_shares_fingerprint(self):
        # winnowing guarantee: common substring of length ≥ k+w-1 ⇒
        # at least one common fingerprint
        k, w = 8, 4
        shared = "this exact span is long enough to be fingerprinted"
        a = "prefix junk AAA " + shared + " suffix one"
        b = "totally different BBB " + shared + " other tail"
        fa = set(textstats.winnow_fingerprints(a, k, w).tolist())
        fb = set(textstats.winnow_fingerprints(b, k, w).tolist())
        assert fa & fb

    def test_disjoint_texts_disjoint_fingerprints(self):
        fa = set(textstats.winnow_fingerprints("abcdefghijklmnop" * 3).tolist())
        fb = set(textstats.winnow_fingerprints("QRSTUVWXYZ012345" * 3).tolist())
        assert not (fa & fb)

    def test_short_and_empty(self):
        assert len(textstats.winnow_fingerprints("", 8, 4)) == 0
        assert len(textstats.winnow_fingerprints("short", 8, 4)) == 0
        assert len(textstats.winnow_fingerprints("exactly8", 8, 4)) == 1

    def test_batch_stage_shapes(self):
        out = textstats.fingerprint_docs(batch_of(DOCS)).to_pandas()
        assert len(out) == len(DOCS)
        assert (out["n_fingerprints"] >= 0).all()
        assert out.iloc[4]["n_fingerprints"] == 0  # empty doc

    def test_rolling_hash_equals_naive(self):
        # the vectorized rolling hash must equal a per-gram recompute
        text = "rolling hash check 12345"
        k = 8
        got = textstats._kgram_hashes(text, k)
        base, mod = int(textstats._FP_BASE), int(textstats._FP_MOD)
        data = text.encode()
        for i in range(len(data) - k + 1):
            h = 0
            for c in data[i : i + k]:
                h = (h * base + c) % mod
            assert got[i] == h


class TestTokenCounts:
    def test_ws_and_bpe_counts(self):
        out = textstats.token_counts(batch_of(DOCS)).to_pandas()
        assert out.iloc[0]["n_tokens_ws"] == len(DOCS[0].split())
        assert out.iloc[4]["n_tokens_ws"] == 0
        # 50 'x' chars → 13 chunks of ≤4 letters
        assert out.iloc[6]["n_tokens_bpe"] == 13
        oracle = len(re.findall(r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]", DOCS[8]))
        assert out.iloc[8]["n_tokens_bpe"] == oracle


class TestTokenStats:
    def _docs(self, ray_session):
        import pandas as pd

        return ray_session.data.from_pandas(
            pd.DataFrame(
                {
                    "text": [
                        "a b b c! c,c d",
                        "b c d d",
                        "",
                        "  a  ",
                    ],
                    "lang": ["en", "en", "fr", "fr"],
                }
            )
        )

    def test_top_tokens_exact(self, ray_session):
        from duplicate_finder_ray.stages.textstats import top_tokens

        got = [
            (r["rank"], r["token"], r["n"])
            for r in top_tokens(self._docs(ray_session), "text", 3).take_all()
        ]
        got.sort()
        # counts: c=4, b=3, d=3, a=2 — tie b/d broken by token asc
        assert got == [(1, "c", 4), (2, "b", 3), (3, "d", 3)]

    def test_distinct_tokens_per_lang(self, ray_session):
        from duplicate_finder_ray.stages.textstats import distinct_token_counts

        got = {
            r["lang"]: r["n_distinct_tokens"]
            for r in distinct_token_counts(
                self._docs(ray_session), "text", "lang"
            ).take_all()
        }
        assert got == {"en": 4, "fr": 1}

    def test_approx_top_tokens_exact_on_small_vocab(self, ray_session):
        # vocabulary below capacity: zero drops, identical to exact
        from duplicate_finder_ray.stages.textstats import approx_top_tokens

        got = [
            (r["rank"], r["token"], r["n"], r["max_underestimate"])
            for r in approx_top_tokens(
                self._docs(ray_session), "text", 3
            ).take_all()
        ]
        got.sort()
        assert got == [(1, "c", 4, 0), (2, "b", 3, 0), (3, "d", 3, 0)]

    def test_approx_top_tokens_zipf_matches_exact(self, ray_session):
        # skewed corpus with vocabulary >> capacity: heavy hitters must
        # survive the per-batch truncation and match the exact oracle,
        # and any underestimate must respect the reported bound
        import numpy as np
        import pandas as pd

        from duplicate_finder_ray.stages.textstats import (
            approx_top_tokens,
            top_tokens,
        )

        rng = np.random.default_rng(5)
        # Zipf token ids over a 30k vocabulary, 800 docs x 150 tokens
        ids = rng.zipf(1.3, size=800 * 150)
        ids = ids[ids < 30_000]
        docs = [
            " ".join(f"t{v}" for v in chunk)
            for chunk in np.array_split(ids, 800)
        ]
        ds = ray_session.data.from_pandas(
            pd.DataFrame({"text": docs})
        ).repartition(8)
        exact = {
            r["token"]: (r["rank"], r["n"])
            for r in top_tokens(ds, "text", 10).take_all()
        }
        approx_rows = approx_top_tokens(ds, "text", 10, capacity=512).take_all()
        bound = approx_rows[0]["max_underestimate"]
        approx = {r["token"]: (r["rank"], r["n"]) for r in approx_rows}
        assert set(approx) == set(exact)
        for tok, (rank, n) in approx.items():
            true_rank, true_n = exact[tok]
            assert rank == true_rank
            assert 0 <= true_n - n <= bound  # lower bound within Σ eps

    def test_hll_error_bound(self, ray_session):
        import numpy as np
        import pandas as pd

        from duplicate_finder_ray.stages.textstats import (
            approx_distinct_tokens,
            hll_estimate,
            hll_partial,
        )

        # pure-sketch check: 50k distinct full-range uint64 hashes
        # (the same siphash the stage feeds it), p=12 → σ≈1.6%
        vals = np.unique(
            pd.util.hash_array(np.arange(50_000).astype(object))
        )
        est = hll_estimate(hll_partial(vals, p=12))
        assert abs(est - len(vals)) / len(vals) < 0.05
        # merge property: split partials must estimate like the whole
        a = hll_partial(vals[: len(vals) // 2], p=12)
        b = hll_partial(vals[len(vals) // 2 :], p=12)
        est2 = hll_estimate(np.maximum(a, b))
        assert est2 == est
        # end-to-end over a Dataset vs the exact distinct count
        texts = [
            " ".join(f"tok{i}" for i in range(j * 500, j * 500 + 500))
            for j in range(20)
        ]
        ds = ray_session.data.from_pandas(pd.DataFrame({"text": texts}))
        approx = approx_distinct_tokens(ds, "text", p=12)
        assert abs(approx - 10_000) / 10_000 < 0.05


class TestCuration:
    def test_normalize_text(self, ray_session):
        import pandas as pd

        from duplicate_finder_ray.stages.textstats import normalize_text

        ds = ray_session.data.from_pandas(
            pd.DataFrame(
                {"doc_id": [1, 2, 3], "text": ["  A \t B\n\nc ", "", "x"]}
            )
        )
        got = {
            r["doc_id"]: (r["text_norm"], r["n_chars_norm"])
            for r in ds.map_batches(
                normalize_text, batch_format="pyarrow"
            ).take_all()
        }
        assert got == {1: ("a b c", 5), 2: ("", 0), 3: ("x", 1)}

    def test_quality_prune_median(self, ray_session):
        import numpy as np
        import pandas as pd

        from duplicate_finder_ray.stages.textstats import (
            quality_prune,
            quality_scores,
        )
        import pyarrow as pa

        texts = [
            "the cat and the dog are in the house",     # prosey
            "x1 9388 !!!! 0x3f ____",                    # junk
            "it was the best of times it was the worst", # prosey
            "0000 1111 2222 3333",                       # junk
        ]
        df = pd.DataFrame(
            {"doc_id": range(4), "text": texts, "lang": ["en"] * 4}
        )
        ds = ray_session.data.from_pandas(df)
        kept = sorted(
            r["doc_id"] for r in quality_prune(ds, frac=0.5).take_all()
        )
        scores = quality_scores(pa.Table.from_pandas(df))[
            "quality_score"
        ].to_numpy()
        cut = np.quantile(scores, 0.5, method="linear")
        assert kept == sorted(np.nonzero(scores >= cut)[0].tolist())
        assert kept == [0, 2]


class TestTrendingTokens:
    def test_topk_per_window_matches_oracle(self, ray_session):
        import datetime as dt
        from collections import Counter

        from duplicate_finder_ray.stages.textstats import trending_tokens

        base = dt.datetime(2024, 1, 1)
        rows = [
            (base + dt.timedelta(minutes=m), txt)
            for m, txt in [
                (0, "alpha beta alpha"),
                (10, "beta gamma"),
                (59, "alpha"),
                (61, "delta delta delta"),
                (90, "alpha delta"),
            ]
        ]
        df = pd.DataFrame(rows, columns=["ts", "props"])
        got = (
            trending_tokens(
                ray_session.data.from_pandas(df), "ts", "props",
                window_us=3_600_000_000, k=2,
            )
            .to_pandas()
            .sort_values(["window_start_us", "rank"])
            .reset_index(drop=True)
        )
        # oracle: count per (hour, token), top-2 by (n desc, token asc)
        want = {}
        for ts, txt in rows:
            w = (int(ts.timestamp() * 1e6) // 3_600_000_000) * 3_600_000_000
            want.setdefault(w, Counter()).update(txt.split())
        expected = []
        for w in sorted(want):
            ranked = sorted(want[w].items(), key=lambda kv: (-kv[1], kv[0]))[:2]
            for i, (tok, n) in enumerate(ranked, 1):
                expected.append((w, tok, n, i))
        assert [tuple(r) for r in got.itertuples(index=False)] == expected

    def test_rejects_bad_params(self, ray_session):
        from duplicate_finder_ray.stages.textstats import trending_tokens

        ds = ray_session.data.from_pandas(
            pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "props": ["x"]})
        )
        import pytest as _pytest

        with _pytest.raises(ValueError):
            trending_tokens(ds, "ts", "props", window_us=0, k=5)
        with _pytest.raises(ValueError):
            trending_tokens(ds, "ts", "props", window_us=100, k=0)


class TestCommonLines:
    def test_counts_and_tiebreak(self, ray_session):
        import pandas as pd

        from duplicate_finder_ray.stages.textstats import common_lines

        df = pd.DataFrame(
            {
                "text": [
                    "# MIT License\nimport os\n\nx = 1",
                    "# MIT License\nimport os\ny = 2",
                    "# MIT License\nimport sys",
                ]
            }
        )
        got = (
            common_lines(ray_session.data.from_pandas(df), "text", k=3)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        # empty line dropped; ties (import os 2 vs ...) break line-asc
        assert list(got["line"]) == ["# MIT License", "import os", "import sys"]
        assert list(got["n"]) == [3, 2, 1]
        assert list(got["rank"]) == [1, 2, 3]

    def test_rejects_bad_k(self, ray_session):
        import pandas as pd
        import pytest as _pytest

        from duplicate_finder_ray.stages.textstats import common_lines

        ds = ray_session.data.from_pandas(pd.DataFrame({"text": ["a"]}))
        with _pytest.raises(ValueError):
            common_lines(ds, "text", k=0)


class TestCompressionRatios:
    def test_matches_direct_zlib_and_separates_repetition(self):
        import zlib

        import pyarrow as pa

        from duplicate_finder_ray.stages.textstats import compression_ratios

        texts = [
            "the quick brown fox jumps over the lazy dog " * 40,
            "ab" * 2000,
            "x",
            "",
        ]
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
        out = compression_ratios(batch)
        for i, t in enumerate(texts):
            raw = t.encode()
            assert out.column("n_bytes")[i].as_py() == len(raw)
            assert out.column("n_compressed")[i].as_py() == len(
                zlib.compress(raw, 6)
            )
            want_ppm = len(zlib.compress(raw, 6)) * 1_000_000 // max(
                len(raw), 1
            )
            assert out.column("compress_ppm")[i].as_py() == want_ppm
        ppm = out.column("compress_ppm").to_pylist()
        # pure repetition deflates far below prose-with-repeats
        assert ppm[1] < ppm[0]


class TestEncodingAudit:
    def test_matches_python_char_oracle(self):
        texts = [
            "plain ascii text, nothing odd",
            "café naïve 中文 mixed",
            "ctrl\x01\x02 and del\x7f inside",
            "tabs\tand\nnewlines\r plus\fform",
            "",
            "� replacement and emoji \U0001f600",
        ]
        out = textstats.encoding_audit(batch_of(texts)).to_pandas()
        ctrl = set(range(0, 9)) | {0x0B, 0x0C} | set(range(0x0E, 0x20)) | {0x7F}
        for i, t in enumerate(texts):
            row = out.iloc[i]
            n_chars = len(t)
            n_non_ascii = sum(1 for c in t if ord(c) > 0x7F)
            n_control = sum(1 for c in t if ord(c) in ctrl)
            n_ws = sum(1 for c in t if c in "\t\n\f\r ")
            assert row["n_chars"] == n_chars
            assert row["n_bytes"] == len(t.encode())
            assert row["n_non_ascii"] == n_non_ascii
            assert row["n_control"] == n_control
            assert row["n_ws"] == n_ws
            safe = max(n_chars, 1)
            assert row["ascii_ppm"] == (n_chars - n_non_ascii) * 1_000_000 // safe
            assert row["ws_ppm"] == n_ws * 1_000_000 // safe


class TestPmiBigrams:
    def _oracle(self, texts, k=30, min_n=3):
        from collections import Counter

        toks = [re.findall(r"[A-Za-z0-9_]+", t) for t in texts]
        uni = Counter(t for ts in toks for t in ts)
        total = sum(uni.values())
        big = Counter(
            (ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1)
        )
        rows = [
            (a, b, n, n * total * 1_000_000 // (uni[a] * uni[b]))
            for (a, b), n in big.items()
            if n >= min_n
        ]
        rows.sort(key=lambda r: (-r[3], r[0], r[1]))
        return [(a, b, n, p, i + 1) for i, (a, b, n, p) in enumerate(rows[:k])]

    def test_matches_python_oracle_and_ranks_collocations(self, ray_session):
        # "new york" is rare but bound; "the" is frequent and independent
        texts = [
            "the trip to new york was long and the food in new york good",
            "she moved to new york while the rest of the team stayed",
            "the the the filler words repeat here and the story goes on",
            "machine learning and machine learning and machine learning",
        ]
        df = pd.DataFrame({"text": texts})
        got = (
            textstats.pmi_bigrams(
                ray_session.data.from_pandas(df), "text", 30, min_n=3
            )
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        want = self._oracle(texts)
        assert len(got) == len(want)
        for i, (a, b, n, p, r) in enumerate(want):
            row = got.iloc[i]
            assert (row["tok_a"], row["tok_b"]) == (a, b)
            assert row["n"] == n
            assert row["pmi_ppm"] == p
            assert row["rank"] == r
        # the bound phrases outrank the frequent-independent pair
        pairs = list(zip(got["tok_a"], got["tok_b"]))
        assert ("the", "the") not in pairs or pairs.index(
            ("new", "york")
        ) < pairs.index(("the", "the"))
        assert ("machine", "learning") in pairs

    def test_min_n_prunes_and_bad_args_raise(self, ray_session):
        import pytest as _pytest

        ds = ray_session.data.from_pandas(
            pd.DataFrame({"text": ["one two three", "four five six"]})
        )
        with _pytest.raises(ValueError):
            textstats.pmi_bigrams(ds, "text", 0)
        with _pytest.raises(ValueError):
            textstats.pmi_bigrams(ds, "text", 5, min_n=0)
        # every bigram is a hapax -> min_n=3 leaves nothing
        out = textstats.pmi_bigrams(ds, "text", 5, min_n=3)
        assert out.count() == 0


class TestLineStats:
    def test_matches_python_oracle(self):
        from collections import Counter

        texts = [
            "a\nb\na\na",            # 4 lines, 2 distinct, top=3
            "x",                      # single line
            "",                       # one empty line (split semantics)
            "\n\n",                   # three empty lines
            "l1\nl1\nl2\n",           # trailing newline -> empty 4th line
        ]
        out = textstats.line_stats(batch_of(texts)).to_pandas()
        for i, t in enumerate(texts):
            lines = t.split("\n")
            c = Counter(lines)
            row = out.iloc[i]
            assert row["n_lines"] == len(lines)
            assert row["n_distinct_lines"] == len(c)
            assert row["top_line_n"] == max(c.values())
            assert row["dup_line_ppm"] == (len(lines) - len(c)) * 1_000_000 // max(
                len(lines), 1
            )


class TestTokenFreqSpectrum:
    def test_matches_counter_of_counters(self, ray_session):
        from collections import Counter

        from duplicate_finder_ray.stages.textstats import token_freq_spectrum

        texts = [
            "a a a b b c",
            "b c! d_1 d_1",
            "",
            "c a",
        ]
        uni = Counter(
            t for s in texts for t in re.findall(r"[A-Za-z0-9_]+", s)
        )
        want = sorted(Counter(uni.values()).items())
        ds = ray_session.data.from_pandas(pd.DataFrame({"text": texts}))
        got = sorted(
            (r["freq"], r["n_tokens"])
            for r in token_freq_spectrum(ds, "text").take_all()
        )
        assert got == want
        # sanity: hapax row exists (d_1 occurs twice, c thrice... a=4)
        assert dict(got)[2] == Counter(uni.values())[2]
