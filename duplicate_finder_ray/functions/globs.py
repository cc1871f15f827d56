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

#: a class that matches no character (RE2-safe stand-in for fnmatch's
#: never-matching "(?!)" — RE2 has no lookahead)
_NEVER_MATCH = "[^\\x00-\\x{10FFFF}]"


def _normalize_class_body(body: str) -> str:
    """Normalize a glob char-class body the way fnmatch.translate does,
    so patterns fnmatch accepts never crash the RE2 compile: escape
    backslashes, drop empty/reversed ``a-b`` ranges (RE2 rejects them
    with 'invalid character class range'; fnmatch silently merges them
    away), and escape dashes that are literal rather than ranges.
    ``body`` excludes any leading ``!``/``^`` negation marker."""
    if "-" not in body[1:]:  # a leading '-' is always literal
        return body.replace("\\", "\\\\")
    chunks: list[str] = []
    start, k = 0, 1
    while True:
        k = body.find("-", k)
        if k < 0:
            break
        chunks.append(body[start:k])
        start = k + 1
        k = k + 3  # a '-' right after a range's end char is literal
    tail = body[start:]
    if tail:
        chunks.append(tail)
    else:
        chunks[-1] += "-"  # trailing dash is literal
    # remove empty/reversed ranges (invalid in RE2; fnmatch merges them)
    for k in range(len(chunks) - 1, 0, -1):
        prev, cur = chunks[k - 1], chunks[k]
        if prev and cur and prev[-1] > cur[0]:
            chunks[k - 1] = prev[:-1] + cur[1:]
            del chunks[k]
    return "-".join(
        c.replace("\\", "\\\\").replace("-", "\\-") for c in chunks
    )


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
                raw = pattern[i + 1 : j]
                neg = raw.startswith("!")
                body = _normalize_class_body(raw[1:] if neg else raw)
                if body.startswith("^") and not neg:
                    # fnmatch negates only on '!'; a leading '^' is a
                    # literal character — escape it so the regex agrees
                    body = "\\" + body
                if not body:
                    # class collapsed to nothing (e.g. '[a--]'):
                    # negated-empty matches any char, plain-empty none
                    out.append("." if neg else _NEVER_MATCH)
                else:
                    out.append(f"[{'^' if neg else ''}{body}]")
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
