"""Unit tests: hashing, glob translation, config normalization."""

import hashlib

import pyarrow as pa
import pytest

from duplicate_finder_ray.config import PipelineConfig, normalize_parallelism
from duplicate_finder_ray.functions.globs import (
    fnmatch_path,
    glob_mask,
    globs_to_regex,
    include_exclude_mask,
)
from duplicate_finder_ray.functions.hashing import (
    file_id_array,
    sha256_hex_array,
    utf8_byte_length,
)


class TestSha256:
    def test_known_vector(self):
        arr = pa.array(["abc"], pa.string())
        assert sha256_hex_array(arr).to_pylist() == [
            hashlib.sha256(b"abc").hexdigest()
        ]

    def test_empty_string(self):
        # reference: hashing an empty file yields the empty-input digest
        # (test_utils.py:24-30)
        assert sha256_hex_array(pa.array([""], pa.string())).to_pylist() == [
            hashlib.sha256(b"").hexdigest()
        ]

    def test_multi_block_equivalence(self):
        # content larger than the reference's 64 KiB streaming block must
        # hash identically (test_utils.py:33-41)
        content = "Z" * (64 * 1024 * 3 + 123)
        out = sha256_hex_array(pa.array([content], pa.string()))
        assert out.to_pylist() == [hashlib.sha256(content.encode()).hexdigest()]

    def test_nulls_and_slices(self):
        arr = pa.array(["a", None, "b"], pa.string())
        out = sha256_hex_array(arr)
        assert out[1].as_py() is None
        assert out[0].as_py() == hashlib.sha256(b"a").hexdigest()
        # sliced arrays (non-zero offset) must hash the right cells
        sliced = arr.slice(2)
        assert sha256_hex_array(sliced).to_pylist() == [
            hashlib.sha256(b"b").hexdigest()
        ]

    def test_large_string(self):
        arr = pa.array(["abc", "def"], pa.large_string())
        assert sha256_hex_array(arr).to_pylist() == [
            hashlib.sha256(b"abc").hexdigest(),
            hashlib.sha256(b"def").hexdigest(),
        ]

    def test_unicode_bytes_not_chars(self):
        s = "héllo 世界"
        assert sha256_hex_array(pa.array([s])).to_pylist() == [
            hashlib.sha256(s.encode("utf-8")).hexdigest()
        ]


class TestByteLength:
    def test_utf8_bytes(self):
        arr = pa.array(["abc", "世界", ""])
        assert utf8_byte_length(arr).to_pylist() == [3, 6, 0]


class TestFileId:
    def test_format(self):
        t = pa.table(
            {"repo": ["o/r"], "path": ["src/a.py"], "commit": ["deadbeef"]}
        )
        assert file_id_array(t).to_pylist() == ["o/r:src/a.py@deadbeef"]


class TestGlobs:
    @pytest.mark.parametrize(
        "pattern,path,expected",
        [
            ("*.py", "org/repo/src/a.py", True),
            ("*.py", "org/repo/src/a.pyc", False),
            ("*temp*", "org/temp/file.txt", True),
            ("*.git/*", "org/.git/objects/ab", True),
            ("?.txt", "a.txt", True),
            ("?.txt", "ab.txt", False),
            ("[ab].txt", "a.txt", True),
            ("[!ab].txt", "c.txt", True),
            ("[!ab].txt", "a.txt", False),
            # fnmatch negates only on '!' — a leading '^' is literal
            ("[^ab]*", "afile", True),
            ("[^ab]*", "^file", True),
            ("[^ab]*", "cfile", False),
            ("src/*.c", "src/main.c", True),
            ("src/*.c", "other/main.c", False),
        ],
    )
    def test_matches_fnmatch(self, pattern, path, expected):
        """Our RE2 translation agrees with stdlib fnmatch (the reference's
        matcher, duplicate_finder.py:150-164) on every case."""
        regex = globs_to_regex([pattern])
        got = glob_mask(pa.array([path]), regex, default=False).to_pylist()[0]
        assert got == expected
        assert got == fnmatch_path(path, [pattern])

    @pytest.mark.parametrize(
        "pattern,path,expected",
        [
            # reversed/invalid ranges: fnmatch silently merges them
            # away; naive RE2 translation crashes ('invalid character
            # class range') — found by the hypothesis property below
            ("[a-9]b", "ab", False),
            ("[a-9]^\\]", "", False),
            ("[/\\-?/9]", "/", True),
            ("[a--]b", "ab", False),   # class collapses to empty
            ("[!a--]b", "xb", True),   # negated-empty matches any char
            ("[a-b-c]", "-", True),    # dash after a range is literal
            ("[-a]", "-", True),       # leading dash is literal
            ("[a-]", "-", True),       # trailing dash is literal
        ],
    )
    def test_invalid_ranges_match_fnmatch(self, pattern, path, expected):
        regex = globs_to_regex([pattern])
        got = glob_mask(pa.array([path]), regex, default=False).to_pylist()[0]
        assert got == expected
        assert got == fnmatch_path(path, [pattern])

    def test_property_agrees_with_fnmatch(self):
        """Hypothesis: on a realistic glob alphabet, the RE2 translation
        agrees with fnmatch.fnmatchcase (the reference's matcher) for
        every pattern fnmatch itself accepts."""
        import re

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=400, deadline=None)
        @given(
            st.text("ab*?[]!^-./\\z9", min_size=0, max_size=10),
            st.text("ab^c-./z9!\\", min_size=0, max_size=10),
        )
        def check(pattern, path):
            import fnmatch

            try:
                want = fnmatch.fnmatchcase(path, pattern)
            except re.error:
                return  # fnmatch itself rejects it — nothing to match
            regex = globs_to_regex([pattern])
            got = glob_mask(pa.array([path]), regex, default=False).to_pylist()[0]
            assert got == want, (pattern, path)

        check()

    def test_none_patterns_keep_all(self):
        paths = pa.array(["a", "b"])
        assert glob_mask(paths, globs_to_regex(None), default=True).to_pylist() == [
            True,
            True,
        ]

    def test_include_then_exclude(self):
        paths = pa.array(["a.py", "a_temp.py", "b.log", "c.md"])
        mask = include_exclude_mask(
            paths, globs_to_regex(["*.py", "*.log"]), globs_to_regex(["*temp*"])
        )
        assert mask.to_pylist() == [True, False, True, False]


class TestConfig:
    def test_sort_exclusivity(self):
        with pytest.raises(ValueError):
            PipelineConfig(sort_by_group_size=True, sort_by_file_size=True)

    def test_pattern_cleanup(self):
        cfg = PipelineConfig(include_patterns=["  *.py  ", "", "   ", "*.md"])
        assert cfg.include_patterns == ["*.py", "*.md"]

    def test_none_patterns_pass_through(self):
        cfg = PipelineConfig()
        assert cfg.include_patterns is None and cfg.exclude_patterns is None

    def test_size_normalization(self):
        cfg = PipelineConfig(min_file_size_str="100KiB", max_file_size_str="2.5GB")
        assert cfg.min_file_size == 102_400
        assert cfg.max_file_size == 2_500_000_000

    def test_size_rejects_config_layer(self):
        with pytest.raises(ValueError):
            PipelineConfig(min_file_size_str="10M")

    def test_parallelism_defaults(self):
        import os

        expected = min(32, os.cpu_count() or 8)
        assert normalize_parallelism(None) == expected
        assert normalize_parallelism(0) == expected
        assert normalize_parallelism(-3) == expected
        assert normalize_parallelism(16) == 16
        with pytest.warns(UserWarning):
            assert normalize_parallelism(64) == 64

    def test_lsh_divisibility(self):
        with pytest.raises(ValueError):
            PipelineConfig(minhash_perms=100, lsh_bands=16)

    def test_lsh_auto_banding(self):
        from duplicate_finder_ray.config import banding_for

        # τ=0.8, K=128: r=4 (b=32) — detection at 0.8 is 1-(1-0.41)^32
        # ≈ 1-5e-8, and r=5 (b=25) still meets 0.995, r=6 does not? —
        # assert via the defining property instead of pinned numbers:
        for tau in (0.5, 0.7, 0.8, 0.9):
            b = banding_for(128, tau, 0.995)
            r = 128 // b
            assert 1 - (1 - tau**r) ** b >= 0.995
            # largest feasible r: one more row per band must miss target
            if r < 128:
                r2 = r + 1
                b2 = 128 // r2
                assert 1 - (1 - tau**r2) ** b2 < 0.995
        # the τ=0.5 case that motivated auto mode: fixed 32×4 detects
        # only ~87% at the threshold; auto must pick r=3
        assert banding_for(128, 0.5, 0.995) == 128 // 3
        # tiny τ: even r=1 misses → falls back to b=K
        assert banding_for(16, 0.01, 0.999) == 16

    def test_banding_validates_effective_rows(self):
        from duplicate_finder_ray.config import banding_for

        # the pipeline runs r_eff = K // b, which can exceed the nominal
        # r the loop validated (ADVICE round 2: banding_for(128, 0.95,
        # 0.998) returned b=9 validated at r=13 but ran r=14 → 0.99757
        # < 0.998). The defining property must hold at r_eff for every
        # (tau, target) combination:
        for tau in (0.3, 0.5, 0.7, 0.8, 0.9, 0.95, 0.99):
            for target in (0.9, 0.99, 0.995, 0.998, 0.9999):
                b = banding_for(128, tau, target)
                r_eff = 128 // b
                got = 1 - (1 - tau**r_eff) ** b
                assert got >= target or b == 128, (tau, target, b, got)

    def test_lsh_auto_resolution(self):
        cfg = PipelineConfig(jaccard_threshold=0.5, lsh_bands=0)
        assert cfg.resolved_lsh_bands == 42  # K=128, r=3
        assert cfg.lsh_rows_per_band == 3
        # explicit value bypasses auto
        assert PipelineConfig(jaccard_threshold=0.5).resolved_lsh_bands == 32

    def test_config_hash_stable(self):
        a = PipelineConfig(min_file_size_str="1KB")
        b = PipelineConfig(min_file_size_str="1KB")
        c = PipelineConfig(min_file_size_str="2KB")
        assert a.config_hash() == b.config_hash() != c.config_hash()
