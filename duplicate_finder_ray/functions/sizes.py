"""Human-readable file-size parsing / formatting.

Behaviorally conformant to the reference's observable semantics
(reference: /root/reference/duplicate_finder/utils.py:19-86 and the
conformance cases in /root/reference/tests/test_utils.py:45-122), written
from scratch:

* ``parse_size`` — ``"2.5 GiB"`` → bytes. Decimal units K/KB/M/MB/G/GB/T/TB
  are powers of 10; binary units Ki/KiB/Mi/MiB/Gi/GiB/Ti/TiB are powers of
  2. A bare number means bytes. Case-insensitive, tolerant of surrounding
  whitespace. Raises ``ValueError`` on anything else.
* ``format_size`` — bytes → ``"1.5 KB"`` style. NOTE the intentional
  reference quirk: the divisor is 1024 but the labels are the decimal ones
  (KB/MB/GB/TB/PB), so ``1024 → "1.0 KB"``. Bytes render with no decimal
  (``"512 B"``). Negative / non-numeric input → ``"Invalid size"``.
* ``validate_size_string`` — the stricter config-layer gate
  (reference: duplicate_finder_config.py:159-184): a unit, when present,
  must end in ``B`` — so ``"10M"`` is REJECTED here even though
  ``parse_size("10M")`` accepts it. The divergence between the two layers
  is observable API behavior and is preserved.
"""

from __future__ import annotations

import re

# Decimal units: powers of 10. Binary units (with I): powers of 2.
# Mirrors the unit table at reference utils.py:36-56.
_UNIT_BYTES: dict[str, int] = {
    "": 1,
    "B": 1,
    "K": 10**3,
    "KB": 10**3,
    "M": 10**6,
    "MB": 10**6,
    "G": 10**9,
    "GB": 10**9,
    "T": 10**12,
    "TB": 10**12,
    "KI": 2**10,
    "KIB": 2**10,
    "MI": 2**20,
    "MIB": 2**20,
    "GI": 2**30,
    "GIB": 2**30,
    "TI": 2**40,
    "TIB": 2**40,
}

# Loose inner grammar (utils layer): number, optional unit, optional B.
_PARSE_RE = re.compile(r"\s*([\d.]+)\s*([KMGT]?I?B?)?\s*", re.IGNORECASE)

# Strict outer grammar (config layer): unit letter requires trailing B.
_VALIDATE_RE = re.compile(r"^\s*(\d*\.?\d*)\s*([KMGT]?I?B)?\s*$", re.IGNORECASE)


def parse_size(size_str: str) -> int:
    """Parse a human size string into an integer byte count.

    Conforms to reference ``str_file_size_to_int`` (utils.py:19-59):
    accepts ``"1"``, ``"1K"``, ``"2.5 GiB"``, ``" 10 mb "``; truncates the
    final float toward zero; raises ``ValueError`` for junk or unknown
    units (including multi-dot numbers like ``"1.2.3"``).
    """
    m = _PARSE_RE.fullmatch(size_str.strip())
    if not m:
        raise ValueError(f"Invalid size string: {size_str}")
    number, unit = m.group(1), (m.group(2) or "").upper()
    if unit not in _UNIT_BYTES:
        raise ValueError(f"Unknown size unit: {unit}")
    try:
        value = float(number)
    except ValueError as exc:  # e.g. "1.2.3" matches [\d.]+ but isn't a float
        raise ValueError(f"Invalid size number: {number}") from exc
    return int(value * _UNIT_BYTES[unit])


def format_size(size_bytes: object) -> str:
    """Render bytes as a human string, reproducing the reference quirk of a
    1024 divisor with decimal-unit labels (utils.py:62-86;
    conformance: test_utils.py:91-122 — ``1024 → "1.0 KB"``).
    """
    if (
        size_bytes is None
        or not isinstance(size_bytes, (int, float))
        or size_bytes < 0
    ):
        return "Invalid size"
    value = float(size_bytes)
    for label in ("B", "KB", "MB", "GB", "TB"):
        if value < 1024:
            return f"{int(value)} B" if label == "B" else f"{value:.1f} {label}"
        value /= 1024
    return f"{value:.1f} PB"


def validate_size_string(size: str | None) -> int | None:
    """Config-layer size normalization: strict grammar, then ``parse_size``.

    Conforms to reference ``normalize_str_file_size``
    (duplicate_finder_config.py:159-184): ``None`` passes through; a unit
    letter without the trailing ``B`` (``"10M"``) raises ``ValueError``;
    an empty or bare-dot number raises ``ValueError``.
    """
    if size is None:
        return None
    m = _VALIDATE_RE.match(size)
    if not m:
        raise ValueError(f"Invalid size format '{size}': must contain a valid number")
    number = m.group(1)
    if not number or number == ".":
        raise ValueError(f"Invalid number format in size '{size}'")
    try:
        return parse_size(size)
    except ValueError as exc:
        raise ValueError(f"Invalid size format '{size}': {exc}") from exc
