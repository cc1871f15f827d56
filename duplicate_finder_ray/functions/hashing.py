"""Content hashing and identity derivation over Arrow batches.

The reference streams SHA-256 over 64 KiB file blocks
(/root/reference/duplicate_finder/utils.py:10-16). Here content is already
in memory as Arrow string/binary cells, so each row hashes in one shot —
bit-identical digests for identical bytes, which is the per-row invariant
BASELINE.json requires (content-sha256 equality input vs output).

All functions take/return Arrow structures and avoid Python-object
conversion where pyarrow allows; the per-row ``hashlib`` call itself is a
C-implemented digest over a zero-copy memoryview of the Arrow buffer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sha256_hex_array(column: pa.ChunkedArray | pa.Array) -> pa.Array:
    """SHA-256 hex digest for every cell of a string/binary column.

    Nulls hash to null. Operates on the raw Arrow value buffers via
    ``memoryview`` slices (no per-row Python ``bytes`` copy until hashlib
    consumes it; ``hashlib.sha256`` accepts buffer objects directly).
    """
    chunks = column.chunks if isinstance(column, pa.ChunkedArray) else [column]
    out: list[str | None] = []
    for chunk in chunks:
        if pa.types.is_large_string(chunk.type) or pa.types.is_large_binary(chunk.type):
            offsets = chunk.buffers()[1]
            off = np.frombuffer(offsets, dtype=np.int64, count=len(chunk) + 1,
                                offset=chunk.offset * 8)
        else:
            offsets = chunk.buffers()[1]
            off = np.frombuffer(offsets, dtype=np.int32, count=len(chunk) + 1,
                                offset=chunk.offset * 4)
        data = chunk.buffers()[2]
        view = memoryview(data) if data is not None else memoryview(b"")
        if chunk.null_count == 0:
            for i in range(len(chunk)):
                out.append(hashlib.sha256(view[off[i]:off[i + 1]]).hexdigest())
        else:
            valid = chunk.is_valid().to_numpy(zero_copy_only=False)
            for i in range(len(chunk)):
                if valid[i]:
                    out.append(hashlib.sha256(view[off[i]:off[i + 1]]).hexdigest())
                else:
                    out.append(None)
    return pa.array(out, type=pa.string())


def utf8_byte_length(column: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Byte length of string/binary cells — the analogue of the reference's
    ``p.stat().st_size`` (duplicate_finder.py:144) for table input.
    ``pc.binary_length`` counts bytes (not codepoints) for string types.
    """
    return pc.cast(pc.binary_length(column), pa.int64())


def file_id_array(batch: pa.Table) -> pa.Array | pa.ChunkedArray:
    """Stable row identity ``repo + ":" + path + "@" + commit``.

    This is the engine's analogue of the reference's resolved absolute path
    string (duplicate_finder.py:125,136); lexicographic order over it
    defines the keep-first rule (reference duplicate_finder.py:246-250,309).
    """
    return pc.binary_join_element_wise(
        pc.binary_join_element_wise(batch["repo"], batch["path"], ":"),
        batch["commit"],
        "@",
    )


def stable_hash_array(vals, hash_key: str | None = None):
    """Value-stable 64-bit siphash of an array (uint64 per element).

    ALWAYS use this for object/string arrays, never bare
    ``pd.util.hash_array``: its default ``categorize=True`` routes
    object arrays through ``factorize``, whose string hash table
    compares C strings — NUL-TRUNCATED — so (a) two keys that differ
    only after an embedded NUL (this engine's exchange-separator
    convention) collapse into ONE category, and (b) a value's hash
    depends on which other values share its block (it inherits the
    category representative's hash), silently breaking cross-block
    co-location. ``categorize=False`` hashes each value's full buffer,
    independent of array composition. (Diagnosed in round 3: at sf0.1
    the dup-dir exchange split 399 directories across partitions and
    emitted 44 false duplicate-directory groups.)
    """
    import pandas as pd

    if hash_key is None:
        return pd.util.hash_array(vals, categorize=False)
    return pd.util.hash_array(vals, hash_key=hash_key, categorize=False)
