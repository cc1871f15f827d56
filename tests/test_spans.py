"""Common-span stage tests (SURVEY.md §7.1 M6) — rolling-hash LCS vs a
brute-force oracle, plus the distributed pair-annotation path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from duplicate_finder_ray.stages.spans import (
    common_spans,
    longest_common_span,
    longest_common_span_sa,
)

KERNELS = [longest_common_span, longest_common_span_sa]


def brute_lcs_len(a: bytes, b: bytes) -> int:
    for length in range(min(len(a), len(b)), 0, -1):
        for i in range(len(a) - length + 1):
            if b.find(a[i : i + length]) >= 0:
                return length
    return 0


@pytest.mark.parametrize(
    "a,b",
    [
        (b"", b""),
        (b"abc", b""),
        (b"hello world", b"hello world"),
        (b"xxhelloxx", b"yyhelloyy"),
        (b"abcdef", b"uvwxyz"),
        (b"aaaa", b"aa"),
        (b"the quick brown fox", b"a quick brown cat"),
    ],
)
@pytest.mark.parametrize("kernel", KERNELS)
def test_lcs_matches_brute_force(a, b, kernel):
    got = kernel(a, b)
    assert got[0] == brute_lcs_len(a, b)
    if got[0]:
        assert a[got[1] : got[1] + got[0]] == b[got[2] : got[2] + got[0]]


def test_lcs_randomized_small_alphabet():
    rng = np.random.default_rng(11)
    for _ in range(120):
        a = bytes(rng.choice([97, 98, 99], size=rng.integers(0, 40)).tolist())
        b = bytes(rng.choice([97, 98, 99], size=rng.integers(0, 40)).tolist())
        got = longest_common_span(a, b)
        assert got[0] == brute_lcs_len(a, b), (a, b)


@pytest.mark.parametrize("kernel", KERNELS)
def test_lcs_min_len_gate(kernel):
    assert kernel(b"xxabcxx", b"yyabcyy", min_len=4) == (0, -1, -1)
    assert kernel(b"xxabcxx", b"yyabcyy", min_len=3)[0] == 3


def test_sa_kernel_bit_identical_to_rolling_hash():
    """The suffix-array kernel must reproduce the rolling-hash kernel's
    output exactly, including (a_start, b_start) tie-breaking."""
    rng = np.random.default_rng(23)
    for _ in range(150):
        a = bytes(rng.choice([97, 98, 99], size=rng.integers(0, 50)).tolist())
        b = bytes(rng.choice([97, 98, 99], size=rng.integers(0, 50)).tolist())
        assert longest_common_span(a, b) == longest_common_span_sa(a, b), (a, b)
    for _ in range(25):
        a = rng.integers(0, 256, size=rng.integers(0, 1500), dtype=np.uint8).tobytes()
        b = rng.integers(0, 256, size=rng.integers(0, 1500), dtype=np.uint8).tobytes()
        assert longest_common_span(a, b, 2) == longest_common_span_sa(a, b, 2)


def test_common_spans_rejects_unknown_algorithm(ray_session):
    pairs = ray_session.data.from_pandas(pd.DataFrame({"a": ["x"], "b": ["y"]}))
    code = ray_session.data.from_pandas(
        pd.DataFrame({"file_id": ["x", "y"], "content": ["aa", "ab"]})
    )
    with pytest.raises(ValueError, match="unknown span algorithm"):
        common_spans(pairs, code, algorithm="nope")


@pytest.mark.parametrize("algorithm", ["rolling_hash", "suffix_array"])
def test_common_spans_distributed(ray_session, algorithm):
    shared = "SHARED COMMON BLOCK OF CODE " * 4
    code = pd.DataFrame(
        {
            "file_id": ["f1", "f2", "f3", "f4"],
            "content": [
                "prefix one\n" + shared + "suffix one",
                "other start\n" + shared + "other end",
                "no overlap at all here",
                "tiny",
            ],
        }
    )
    pairs = pd.DataFrame({"a": ["f1", "f3"], "b": ["f2", "f4"]})
    out = (
        common_spans(
            ray_session.data.from_pandas(pairs),
            ray_session.data.from_pandas(code),
            min_span=16,
            algorithm=algorithm,
        )
        .to_pandas()
        .set_index(["a", "b"])
    )
    r12 = out.loc[("f1", "f2")]
    assert r12["span_len"] >= len(shared.encode())
    c1, c2 = code["content"][0].encode(), code["content"][1].encode()
    assert (
        c1[r12["a_start"] : r12["a_start"] + r12["span_len"]]
        == c2[r12["b_start"] : r12["b_start"] + r12["span_len"]]
    )
    r34 = out.loc[("f3", "f4")]
    assert r34["span_len"] == 0 and r34["a_start"] == -1


def test_common_spans_empty_pairs(ray_session):
    import pyarrow as pa

    pairs = ray_session.data.from_arrow(
        pa.schema([("a", pa.string()), ("b", pa.string())]).empty_table()
    )
    code = ray_session.data.from_pandas(
        pd.DataFrame({"file_id": ["x"], "content": ["y"]})
    )
    out = common_spans(pairs, code)
    assert out.count() == 0
    assert set(out.schema().names) == {"a", "b", "span_len", "a_start", "b_start"}
