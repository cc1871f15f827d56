"""Conformance tests for size parse/format — the reference's own
parametrized matrices (/root/reference/tests/test_utils.py:45-122 and
test_duplicate_finder_config.py:41-63) as test vectors."""

import pytest

from duplicate_finder_ray.functions.sizes import (
    format_size,
    parse_size,
    validate_size_string,
)


@pytest.mark.parametrize(
    "text,expected",
    [
        ("0", 0),
        ("1", 1),
        ("512", 512),
        ("1K", 10**3),
        ("1KB", 10**3),
        ("1M", 10**6),
        ("1MB", 10**6),
        ("1G", 10**9),
        ("1GB", 10**9),
        ("1T", 10**12),
        ("1TB", 10**12),
        ("1Ki", 2**10),
        ("1KiB", 2**10),
        ("1Mi", 2**20),
        ("1MiB", 2**20),
        ("1Gi", 2**30),
        ("1GiB", 2**30),
        ("1Ti", 2**40),
        ("1TiB", 2**40),
        ("2.5KB", 2500),
        ("2.5 KiB", 2560),
        ("  10 mb  ", 10**7),
        ("1kib", 2**10),
        ("0.5GB", 5 * 10**8),
    ],
)
def test_parse_size_valid(text, expected):
    assert parse_size(text) == expected


@pytest.mark.parametrize("text", ["", "abc", "12XB", "1.2.3", "KB", "12QB", "--5"])
def test_parse_size_invalid(text):
    with pytest.raises(ValueError):
        parse_size(text)


@pytest.mark.parametrize(
    "n,expected",
    [
        (0, "0 B"),
        (1, "1 B"),
        (512, "512 B"),
        (1023, "1023 B"),
        (1024, "1.0 KB"),  # reference quirk: /1024 but decimal label
        (1536, "1.5 KB"),
        (1024**2, "1.0 MB"),
        (1024**3, "1.0 GB"),
        (1024**4, "1.0 TB"),
        (1024**5, "1.0 PB"),
        (5.5 * 1024, "5.5 KB"),
    ],
)
def test_format_size(n, expected):
    assert format_size(n) == expected


@pytest.mark.parametrize("bad", [None, -1, -1024, "100", [], {}])
def test_format_size_invalid(bad):
    assert format_size(bad) == "Invalid size"


# Config-layer matrix (reference test_duplicate_finder_config.py:41-63):
@pytest.mark.parametrize(
    "text,expected",
    [
        (None, None),
        ("10", 10),
        ("2.5GB", 2_500_000_000),
        ("100KiB", 102_400),
        ("1 MB", 10**6),
    ],
)
def test_validate_size_string_accept(text, expected):
    assert validate_size_string(text) == expected


@pytest.mark.parametrize("text", ["10M", "10K", "1Gi", "abc", "", ".", "10XB"])
def test_validate_size_string_reject(text):
    """Unit letter without trailing B rejected at the config layer even
    though parse_size accepts it — observable reference divergence."""
    with pytest.raises(ValueError):
        validate_size_string(text)


def test_layer_divergence():
    assert parse_size("10M") == 10**7  # loose layer accepts
    with pytest.raises(ValueError):
        validate_size_string("10M")  # strict layer rejects


class TestSizeGrammarProperty:
    def test_parse_matches_unit_arithmetic(self):
        """Hypothesis: for any magnitude and any unit in the reference's
        table, parse(f'{x} {unit}') == int(x * multiplier) — i.e. the
        grammar is exactly the two-layer unit arithmetic the reference
        defines (utils.py:19-59), across whitespace and case variants."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from duplicate_finder_ray.functions.sizes import parse_size

        units = {
            "B": 1,
            "KB": 10**3, "MB": 10**6, "GB": 10**9, "TB": 10**12,
            "KIB": 2**10, "MIB": 2**20, "GIB": 2**30, "TIB": 2**40,
        }

        @settings(max_examples=300, deadline=None)
        @given(
            st.floats(min_value=0, max_value=1e6, allow_nan=False,
                      allow_infinity=False),
            st.sampled_from(sorted(units)),
            st.sampled_from(["{}{}", "{} {}", "  {}  {}  "]),
            st.booleans(),
        )
        def check(x, unit, fmt, lower):
            mag = round(x, 3)  # the grammar takes decimal literals
            u = unit.lower() if lower else unit
            s = fmt.format(mag, u)
            assert parse_size(s) == int(mag * units[unit])

        check()
