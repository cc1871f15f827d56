"""Text analysis stages for training-data curation: quality scoring,
language identification, document fingerprinting.

Training-data-pipeline extension (reference has no text analytics —
SURVEY.md §2.5). All stages are stateless vectorized ``map_batches``
over zero-copy Arrow batches; the language-ID word lists are small
constants compiled into each task (no actor state needed).

SQL twins: ``quality_scores`` and ``language_id`` are expressed in
ANSI SQL for the DuckDB oracle (both engines run RE2 regexes, so the
character-class semantics match; the language-ID twin is generated
from the same LANG_MARKERS constant with a cascading CASE reproducing
argmax's first-max tie-break). Winnowing fingerprints are checked by
a Python oracle in tests (rolling-hash logic is not reasonably
SQL-expressible).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# -- quality scoring ---------------------------------------------------

#: fixed stopword list (quality signal: natural prose has stopwords,
#: word salad / minified code has few). Keep in lockstep with
#: STOPWORD_REGEX below and the SQL twin in pipelines/queries.py.
STOPWORDS = (
    "the of and to in a is that it for on with as are be this was".split()
)
STOPWORD_REGEX = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document quality metrics: n_chars, n_words, mean_word_len,
    punct_ratio, digit_ratio, stopword_ratio, plus a composite
    ``quality_score`` in [0, 1]. Vectorized pyarrow.compute kernels."""
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    trimmed = pc.utf8_trim_whitespace(text)
    words = pc.split_pattern_regex(trimmed, r"\s+")
    n_words = pc.cast(pc.list_value_length(words), pa.int64())
    n_words = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()), n_words)

    def count_re(pattern: str) -> pa.Array:
        return pc.cast(
            pc.count_substring_regex(text, pattern), pa.int64()
        )

    n_punct = count_re(r"[!-/:-@\[-`{-~]")
    n_digit = count_re(r"[0-9]")
    n_stop = count_re(STOPWORD_REGEX)

    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    safe_words = pc.max_element_wise(n_words, pa.scalar(1, pa.int64()))
    punct_ratio = pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(safe_chars, pa.float64()))
    digit_ratio = pc.divide(pc.cast(n_digit, pa.float64()), pc.cast(safe_chars, pa.float64()))
    stop_ratio = pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(safe_words, pa.float64()))
    mean_wlen = pc.divide(pc.cast(n_chars, pa.float64()), pc.cast(safe_words, pa.float64()))

    # composite score: rewards prose-like stopword density, penalizes
    # punctuation/digit walls and degenerate word lengths
    score = pc.multiply(
        pc.min_element_wise(
            pc.multiply(stop_ratio, pa.scalar(2.5)), pa.scalar(1.0)
        ),
        pc.multiply(
            pc.max_element_wise(
                pc.subtract(pa.scalar(1.0), pc.multiply(punct_ratio, pa.scalar(2.0))),
                pa.scalar(0.0),
            ),
            pc.max_element_wise(
                pc.subtract(pa.scalar(1.0), pc.multiply(digit_ratio, pa.scalar(2.0))),
                pa.scalar(0.0),
            ),
        ),
    )

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": n_chars,
            "n_words": n_words,
            "n_punct": n_punct,
            "n_digits": n_digit,
            "n_stopwords": n_stop,
            # raw doubles, no rounding: both engines evaluate the same
            # IEEE-754 expression tree over the same ints → identical bits
            "punct_ratio": punct_ratio,
            "digit_ratio": digit_ratio,
            "stopword_ratio": stop_ratio,
            "mean_word_len": mean_wlen,
            "quality_score": score,
        }
    )


# -- language identification ------------------------------------------

#: tiny per-language marker-word lists (public, frequency-list style).
#: A real system would use fastText/CLD3; this is the deterministic
#: n-gram/wordlist heuristic the task spec asks for.
LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and of to in is you that it he was for on are with".split(),
    "de": "der die und in den von zu das mit sich des auf ist nicht".split(),
    "fr": "le de la et les des en un du une est que dans qui pas".split(),
    "es": "de la que el en y los del las un por con una su para".split(),
}


def _lang_patterns() -> dict[str, str]:
    return {
        lang: r"(?i)\b(" + "|".join(words) + r")\b"
        for lang, words in LANG_MARKERS.items()
    }


def language_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: per-language marker-word hit rate
    (hits / words); argmax wins, 'unknown' when the best rate is below
    2% or the document is empty. Deterministic tie-break: language name
    ascending. Fully vectorized (one RE2 scan per language)."""
    text = batch.column(text_col)
    trimmed = pc.utf8_trim_whitespace(text)
    n_words = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    n_words = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), n_words)
    words = np.maximum(n_words.to_numpy(zero_copy_only=False).astype(np.float64), 1.0)

    langs = sorted(LANG_MARKERS)  # asc order = deterministic tie-break
    rates = np.empty((len(batch), len(langs)), dtype=np.float64)
    for j, lang in enumerate(langs):
        hits = pc.count_substring_regex(text, _lang_patterns()[lang])
        rates[:, j] = hits.to_numpy(zero_copy_only=False).astype(np.float64) / words

    best = rates.argmax(axis=1)  # argmax takes FIRST max → asc-name tie-break
    best_rate = rates[np.arange(len(batch)), best]
    pred = np.array(langs, dtype=object)[best]
    pred[best_rate < 0.02] = "unknown"

    # explicit half-up rounding (floor(x*1e6 + 0.5)) — the same IEEE op
    # sequence the DuckDB oracle twin runs, so scores match bit-for-bit
    # (np.round is half-to-even, DuckDB round() half-away-from-zero)
    score = np.floor(best_rate * 1e6 + 0.5) / 1e6
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(pred.tolist(), pa.string()),
            "lang_score": pa.array(score),
        }
    )


# -- document fingerprinting (winnowing) -------------------------------

#: 31-bit Mersenne prime modulus: every intermediate term is bounded by
#: 256 · 2^31 · k < 2^63, so the whole computation stays in exact int64
#: with no Python-loop scan. 2^31 hash space ⇒ spurious gram collisions
#: at ~n²/2^31 — harmless extra candidates in dedup, never missed ones.
_FP_MOD = np.int64((1 << 31) - 1)
_FP_BASE = np.int64(1_000_003)


def _kgram_hashes(text: str, k: int) -> np.ndarray:
    """Polynomial hashes of all character k-grams, fully vectorized:
    h(i) = Σ_j data[i+j]·base^(k-1-j) mod M as one sliding-window
    matvec (k is small, so this is O(n·k) SIMD work, zero Python loops
    over positions)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data)
    if n < k:
        return np.empty(0, dtype=np.int64)
    weights = np.empty(k, dtype=np.int64)
    w = 1
    for j in range(k - 1, -1, -1):
        weights[j] = w
        w = (w * int(_FP_BASE)) % int(_FP_MOD)
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.int64)
    return (windows @ weights) % _FP_MOD


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> np.ndarray:
    """Winnowing (Schleimer, Wilkerson, Aiken — SIGMOD'03): min k-gram
    hash per sliding window, deduplicated, sorted. Guarantees any shared
    substring of length ≥ k + window - 1 yields a shared fingerprint."""
    h = _kgram_hashes(text, k)
    if len(h) == 0:
        return np.empty(0, dtype=np.int64)
    if len(h) <= window:
        return np.unique(h.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
    return np.unique(mins)


def fingerprint_docs(
    batch: pa.Table, text_col: str = "text", k: int = 8, window: int = 4
) -> pa.Table:
    """(doc_id, fingerprints list<uint64>, n_fingerprints) per document."""
    texts = batch.column(text_col).to_pylist()
    fps = [winnow_fingerprints(t or "", k, window) for t in texts]
    offsets = np.zeros(len(fps) + 1, dtype=np.int64)
    np.cumsum([len(f) for f in fps], out=offsets[1:])
    flat = np.concatenate(fps) if fps else np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprints": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(flat, pa.uint64())
            ),
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
        }
    )


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokens + BPE-ish subword proxy count (word chunks and
    punctuation runs via one RE2 scan — a deterministic stand-in for a
    real tokenizer's token count)."""
    text = batch.column(text_col)
    trimmed = pc.utf8_trim_whitespace(text)
    ws = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    ws = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), ws)
    # word pieces of ≤4 chars + punct runs ≈ BPE granularity
    bpe = pc.count_substring_regex(text, r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens_ws": pc.cast(ws, pa.int64()),
            "n_tokens_bpe": pc.cast(bpe, pa.int64()),
        }
    )


def quality_stage(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(quality_scores, batch_format="pyarrow")


def language_stage(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(language_id, batch_format="pyarrow")


def fingerprint_stage(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(fingerprint_docs, batch_format="pyarrow")
