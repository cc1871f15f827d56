"""Vectorized include/exclude glob predicates over Arrow path columns.

The reference applies ``fnmatch.fnmatch`` per file against each pattern —
include first (keep iff ≥1 include matches; no include patterns ⇒ keep
all), then exclude (drop iff ≥1 exclude matches)
(/root/reference/duplicate_finder/duplicate_finder.py:150-164). Here the
same semantics run as ONE compiled alternation regex evaluated by
``pyarrow.compute.match_substring_regex`` over the whole batch — no
per-row Python.
"""

from __future__ import annotations

import fnmatch

import pyarrow as pa
import pyarrow.compute as pc


_RE2_SPECIAL = set(".^$+{}()|\\")


def _glob_to_re2(pattern: str) -> str:
    """Translate one fnmatch glob to an RE2-compatible regex body.

    stdlib ``fnmatch.translate`` emits constructs RE2 rejects (``\\Z``,
    atomic groups ``(?>``), so we translate ourselves. Semantics match
    fnmatch: ``*`` crosses ``/`` (full-string match), ``?`` is any one
    char, ``[...]``/``[!...]`` are char classes.
    """
    out: list[str] = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "!":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append("\\[")
            else:
                body = pattern[i + 1 : j].replace("\\", "\\\\")
                if body.startswith("!"):
                    body = "^" + body[1:]
                elif body.startswith("^"):
                    # fnmatch negates only on '!'; a leading '^' is a
                    # literal character — escape it so the regex agrees
                    body = "\\^" + body[1:]
                out.append(f"[{body}]")
                i = j
        elif c in _RE2_SPECIAL:
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    return "".join(out)


def globs_to_regex(patterns: list[str] | None) -> str | None:
    """Compile a list of fnmatch globs into a single fully-anchored RE2
    alternation. Returns None when there is nothing to match (None or
    empty list), mirroring the reference's "no patterns ⇒ no-op".
    """
    if not patterns:
        return None
    parts = [f"(?:{_glob_to_re2(p)})" for p in patterns]
    return "^(?:" + "|".join(parts) + ")$"


def glob_mask(
    paths: pa.ChunkedArray | pa.Array, regex: str | None, default: bool
) -> pa.ChunkedArray | pa.Array:
    """Boolean mask of paths matching the compiled alternation.

    ``default`` is the value when regex is None (True for include — keep
    all; False for exclude — drop none).
    """
    if regex is None:
        return pa.array([default] * len(paths), type=pa.bool_())
    return pc.match_substring_regex(paths, regex)


def include_exclude_mask(
    paths: pa.ChunkedArray | pa.Array,
    include_regex: str | None,
    exclude_regex: str | None,
) -> pa.ChunkedArray | pa.Array:
    """keep = include_ok AND NOT exclude_hit (reference ordering: include
    takes precedence, then exclude drops — duplicate_finder.py:150-164)."""
    keep = glob_mask(paths, include_regex, default=True)
    if exclude_regex is not None:
        keep = pc.and_(keep, pc.invert(glob_mask(paths, exclude_regex, default=False)))
    return keep


def fnmatch_path(path: str, patterns: list[str]) -> bool:
    """Scalar reference-parity helper (used in tests as the oracle)."""
    return any(fnmatch.fnmatch(path, p) for p in patterns)
