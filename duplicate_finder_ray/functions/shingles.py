"""Shingling, MinHash, SimHash — deterministic, vectorized primitives.

The reference has no near-dup support; these implement the MinHash
shingle signatures and SimHash fingerprints mandated by BASELINE.json's
north_rule, built only on public algorithms (Broder 1997 MinHash;
Charikar 2002 SimHash; Leskovec/Rajaraman/Ullman MMDS ch.3 LSH banding).

Design for the hot path:

* token→uint64 ids come from an 8-byte blake2b digest, memoised in a
  per-instance vocab dict — a ``Shingler`` lives inside a map_batches
  ACTOR so the cache amortises across batches (stateful-stage rule);
* k-token shingle hashes are a vectorized rolling mix over the token-id
  array (uint64 wraparound multiply-xor), deduped with ``np.unique``;
* MinHash signatures use the classic universal-hash family
  ``min((a_i * s + b_i) mod 2^64)`` evaluated as one numpy outer
  product per document;
* LSH band keys mix each signature row-block into one uint64, vectorized
  across the whole batch at once.

Everything is seeded; identical (text, config, seed) ⇒ identical
signatures on every worker — required for the recall≥0.99 comparison at
identical shingle/signature config.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_MIX = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio odd constant
_U64 = np.uint64
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def token_id(token: str) -> int:
    """Stable 64-bit id of a token (blake2b 8-byte digest)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"
    )


def token_id_md5(token: str) -> int:
    """SQL-parity 64-bit token id: the LAST 8 bytes of md5,
    little-endian — exactly DuckDB's ``md5_number_lower(token)``. The
    "md5" hash family exists so the driver oracle can replay the whole
    signature pipeline (rolling shingle mix, MinHash permutations, LSH
    band keys, SimHash votes — all uint64-wraparound arithmetic, which
    SQL emulates with HUGEINT limb products) bit-for-bit; blake2b stays
    the production default."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[8:], "little")


class Shingler:
    """Tokenize + k-shingle hash with a memoised token vocabulary.

    mode: "token" (``\\w+`` word tokens), "line" (non-blank lines), or
    "char" (k applies to characters, hashed in sliding windows).

    token_hash: "blake2b" (default) or "md5" — the SQL-replayable
    family (:func:`token_id_md5`). The md5 family also pins token-mode
    tokenization to the ASCII class ``[A-Za-z0-9_]+`` (DuckDB
    ``regexp_extract_all`` parity); everything downstream of the token
    ids is identical code.
    """

    _ASCII_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")

    def __init__(
        self, k: int = 5, mode: str = "token", token_hash: str = "blake2b"
    ) -> None:
        if mode not in ("token", "line", "char"):
            raise ValueError(f"invalid shingle mode: {mode}")
        if token_hash not in ("blake2b", "md5"):
            raise ValueError(f"invalid token_hash: {token_hash}")
        self.k = k
        self.mode = mode
        self.token_hash = token_hash
        self._hash_one = token_id if token_hash == "blake2b" else token_id_md5
        self._vocab: dict[str, int] = {}

    def _ids(self, units: list[str]) -> np.ndarray:
        vocab = self._vocab
        hash_one = self._hash_one
        out = np.empty(len(units), dtype=np.uint64)
        for i, u in enumerate(units):
            h = vocab.get(u)
            if h is None:
                h = hash_one(u)
                vocab[u] = h
            out[i] = h
        return out

    def units(self, text: str) -> list[str]:
        if self.mode == "token":
            if self.token_hash == "md5":
                return self._ASCII_TOKEN_RE.findall(text)
            return _TOKEN_RE.findall(text)
        if self.mode == "line":
            return [ln for ln in text.splitlines() if ln.strip()]
        return list(text)

    def shingle_hashes(self, text: str) -> np.ndarray:
        """Deduped uint64 hashes of all k-shingles of ``text``.

        Rolling combine: ``h = ((h * MIX) ^ id_j)`` over each window of k
        token ids, evaluated as k vectorized passes over the id array.
        Documents with fewer than k tokens yield an empty array (they can
        only match via exact dedup).
        """
        ids = self._ids(self.units(text))
        n = len(ids)
        k = self.k
        if n < k:
            return np.empty(0, dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = ids[: n - k + 1].copy()
            for j in range(1, k):
                h = (h * _MIX) ^ ids[j : n - k + j + 1]
        return np.unique(h)

    def shingle_set(self, text: str) -> set[int]:
        return set(self.shingle_hashes(text).tolist())

    def _ids_batch(self, units: list[str]) -> np.ndarray:
        """Vectorized twin of ``_ids`` for one batch's flattened token
        stream: ``pd.factorize`` (C hash table) collapses the stream to
        its distinct tokens, the Python loop + blake2b run only over
        those distinct values (source batches repeat tokens heavily),
        and the memoised vocab still carries hits across batches."""
        if not units:
            return np.empty(0, dtype=np.uint64)
        codes, uniques = pd.factorize(np.asarray(units, dtype=object))
        vocab = self._vocab
        hash_one = self._hash_one
        uid = np.empty(len(uniques), dtype=np.uint64)
        for i, u in enumerate(uniques):
            h = vocab.get(u)
            if h is None:
                h = hash_one(u)
                vocab[u] = h
            uid[i] = h
        return uid[codes]

    def shingle_hashes_batch(
        self, texts: list[str | None]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-doc deduped k-shingle hashes for a whole batch in flat
        CSR form: ``(flat uint64 hashes, int64 offsets[n_docs+1])``,
        where doc i's (ascending-sorted) set is ``flat[off[i]:off[i+1]]``.

        Bit-identical to calling :meth:`shingle_hashes` per doc
        (property-tested), but the rolling hash, the cross-doc window
        mask and the per-doc dedupe are all whole-batch numpy passes —
        the per-doc Python loop only tokenizes.
        """
        n_docs = len(texts)
        units_per_doc = [self.units(t if t is not None else "") for t in texts]
        counts = np.fromiter(
            (len(u) for u in units_per_doc), dtype=np.int64, count=n_docs
        )
        ids = self._ids_batch([u for doc in units_per_doc for u in doc])
        return self._csr_from_ids(ids, counts, n_docs)

    def shingle_hashes_batch_column(
        self, col: "pa.Array | pa.ChunkedArray", ascii_only: bool = False
    ) -> tuple[np.ndarray, np.ndarray]:
        r"""Arrow-native twin of :meth:`shingle_hashes_batch` taking the
        string column directly. For ALL-ASCII token-mode batches the
        tokenize runs as RE2 split + dictionary-encode entirely in
        Arrow C — no per-doc Python regex, no per-token Python string
        objects (the dominant cost of the signature stage). Non-ASCII
        batches fall back to the Python tokenizer, whose ``\w`` is
        Unicode-aware where RE2's is ASCII (bit-identity over arbitrary
        unicode is property-tested).

        ``ascii_only=True`` selects SQL-parity tokenization instead:
        tokens are maximal ``[A-Za-z0-9_]+`` runs for EVERY row —
        non-ASCII codepoints act as separators — exactly DuckDB's
        ``regexp_extract_all(text, '[A-Za-z0-9_]+')`` (both engines run
        RE2 over UTF-8). Used by oracle-gated stages (decontamination)
        whose shingle sets must be provably identical to SQL's."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        is_text = pa.types.is_string(col.type) or pa.types.is_large_string(
            col.type
        )
        if self.mode != "token" or not is_text or len(col) == 0:
            return self.shingle_hashes_batch(col.to_pylist())
        if self.token_hash == "md5":
            ascii_only = True  # the md5 family IS the SQL-parity config
        arr = pc.fill_null(col, "")
        if not ascii_only:
            # ASCII gate: bytes == codepoints for every row ⇒ RE2's \W+
            # split equals python re's unicode \w+ findall
            ascii_ok = pc.all(
                pc.equal(pc.binary_length(arr), pc.utf8_length(arr))
            ).as_py()
            if not ascii_ok:
                return self.shingle_hashes_batch(col.to_pylist())
        n_docs = len(arr)
        split = pc.split_pattern_regex(arr, r"[^0-9A-Za-z_]+")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        counts = np.bincount(parent, minlength=n_docs).astype(np.int64)
        if len(flat) == 0:
            return np.empty(0, dtype=np.uint64), np.zeros(
                n_docs + 1, dtype=np.int64
            )
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = enc.dictionary.to_pylist()
        vocab = self._vocab
        hash_one = self._hash_one
        uid = np.empty(len(uniques), dtype=np.uint64)
        for i, u in enumerate(uniques):  # digest DISTINCT tokens only
            h = vocab.get(u)
            if h is None:
                h = hash_one(u)
                vocab[u] = h
            uid[i] = h
        return self._csr_from_ids(uid[codes], counts, n_docs)

    def shingle_positions_batch_column(
        self, col: "pa.Array | pa.ChunkedArray", ascii_only: bool = False
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Positional twin of :meth:`shingle_hashes_batch_column` —
        NO per-doc dedupe; returns (flat uint64 hashes, flat int64
        0-based window positions within each doc, offsets[n_docs+1]).
        Needed by span-level consumers (duplicated-passage extraction)
        where WHERE a gram sits matters, not just membership."""
        import pyarrow as pa

        flat_ids, counts = self._token_ids_column(col, ascii_only)
        n_docs = len(counts)
        n = len(flat_ids)
        k = self.k
        empty = (
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.int64),
            np.zeros(n_docs + 1, dtype=np.int64),
        )
        if n < k:
            return empty
        ids = flat_ids
        with np.errstate(over="ignore"):
            h = ids[: n - k + 1].copy()
            for j in range(1, k):
                h = (h * _MIX) ^ ids[j : n - k + j + 1]
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        start_doc = doc_of[: n - k + 1]
        valid = doc_of[k - 1 :] == start_doc
        wh, wd = h[valid], start_doc[valid]
        if len(wh) == 0:
            return empty
        doc_off = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=doc_off[1:])
        wpos = np.nonzero(valid)[0] - doc_off[wd]
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(np.bincount(wd, minlength=n_docs), out=offsets[1:])
        return wh, wpos, offsets

    def _token_ids_column(
        self, col: "pa.Array | pa.ChunkedArray", ascii_only: bool
    ) -> tuple[np.ndarray, np.ndarray]:
        """(flat token-id stream, per-doc token counts) — the shared
        front half of the batch kernels (tokenize + digest)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        is_text = pa.types.is_string(col.type) or pa.types.is_large_string(
            col.type
        )
        n_docs = len(col)
        if self.mode != "token" or not is_text or n_docs == 0:
            units_per_doc = [
                self.units(t if t is not None else "")
                for t in (col.to_pylist() if n_docs else [])
            ]
            counts = np.fromiter(
                (len(u) for u in units_per_doc), dtype=np.int64, count=n_docs
            )
            return (
                self._ids_batch([u for doc in units_per_doc for u in doc]),
                counts,
            )
        if self.token_hash == "md5":
            ascii_only = True
        arr = pc.fill_null(col, "")
        if not ascii_only:
            ascii_ok = pc.all(
                pc.equal(pc.binary_length(arr), pc.utf8_length(arr))
            ).as_py()
            if not ascii_ok:
                units_per_doc = [self.units(t) for t in arr.to_pylist()]
                counts = np.fromiter(
                    (len(u) for u in units_per_doc), dtype=np.int64, count=n_docs
                )
                return (
                    self._ids_batch([u for doc in units_per_doc for u in doc]),
                    counts,
                )
        split = pc.split_pattern_regex(arr, r"[^0-9A-Za-z_]+")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        counts = np.bincount(parent, minlength=n_docs).astype(np.int64)
        if len(flat) == 0:
            return np.empty(0, dtype=np.uint64), counts
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = enc.dictionary.to_pylist()
        vocab = self._vocab
        hash_one = self._hash_one
        uid = np.empty(len(uniques), dtype=np.uint64)
        for i, u in enumerate(uniques):
            hh = vocab.get(u)
            if hh is None:
                hh = hash_one(u)
                vocab[u] = hh
            uid[i] = hh
        return uid[codes], counts

    def _csr_from_ids(
        self, ids: np.ndarray, counts: np.ndarray, n_docs: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Rolling k-window hash + cross-doc mask + per-doc dedupe over a
        flattened token-id stream — shared by both tokenize paths."""
        n = len(ids)
        k = self.k
        empty_offsets = np.zeros(n_docs + 1, dtype=np.int64)
        if n < k:
            return np.empty(0, dtype=np.uint64), empty_offsets
        with np.errstate(over="ignore"):
            h = ids[: n - k + 1].copy()
            for j in range(1, k):
                h = (h * _MIX) ^ ids[j : n - k + j + 1]
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        start_doc = doc_of[: n - k + 1]
        valid = doc_of[k - 1 :] == start_doc  # window inside one doc
        wh, wd = h[valid], start_doc[valid]
        if len(wh) == 0:
            return np.empty(0, dtype=np.uint64), empty_offsets
        order = np.lexsort((wh, wd))
        wh, wd = wh[order], wd[order]
        first = np.empty(len(wh), dtype=bool)
        first[0] = True
        np.logical_or(wd[1:] != wd[:-1], wh[1:] != wh[:-1], out=first[1:])
        wh, wd = wh[first], wd[first]
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(np.bincount(wd, minlength=n_docs), out=offsets[1:])
        return wh, offsets


def minhash_params(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) coefficient vectors for the permutation family; a is
    forced odd so multiplication is a bijection mod 2^64."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) * _U64(2) + _U64(1)
    b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature (uint64[K]) of one shingle-hash set. Empty sets
    get the all-max sentinel signature (matches nothing)."""
    if len(shingles) == 0:
        return np.full(len(a), _U64_MAX, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hashed = shingles[:, None] * a[None, :] + b[None, :]
    return hashed.min(axis=0)


#: row-block length for the CSR batch kernels: buffers stay ~2 MB —
#: cache-resident AND, critically, REUSED. Fresh large allocations pay
#: first-touch page faults at single-digit MB/s in sandboxed kernels
#: (measured: a one-shot 20 MB broadcast temp costs ~3 s the first
#: time, 10 ms once its pages exist) — so the kernels write into
#: persistent workspaces handed down by the calling actor.
_ROW_BLOCK = 8192


def _workspace(work: dict | None, key: str, shape: tuple, dtype) -> np.ndarray:
    """Fetch/create a persistent scratch buffer (grown, never shrunk)."""
    if work is None:
        return np.empty(shape, dtype=dtype)
    buf = work.get(key)
    if buf is None or any(bs < ss for bs, ss in zip(buf.shape, shape)):
        buf = np.empty(shape, dtype=dtype)
        work[key] = buf
    return buf


def batch_minhash(
    flat: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    work: dict | None = None,
) -> np.ndarray:
    """MinHash signatures for a CSR batch of shingle sets (see
    ``Shingler.shingle_hashes_batch``) — (n_docs, K) uint64, identical
    to :func:`minhash_signature` per doc (empty set → all-max sentinel).

    Blocked evaluation: ``_ROW_BLOCK × 32``-perm tiles computed into a
    persistent workspace (``work`` — pass the same dict across batches,
    e.g. an actor attribute) with ``np.minimum.reduceat`` per tile and a
    min-merge into the output for docs spanning blocks."""
    n_docs = len(offsets) - 1
    num_perms = len(a)
    out = np.full((n_docs, num_perms), _U64_MAX, dtype=np.uint64)
    n = len(flat)
    if n == 0:
        return out
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
    chunk = 32
    mul = _workspace(work, "minhash_mul", (_ROW_BLOCK, chunk), np.uint64)
    with np.errstate(over="ignore"):
        for r0 in range(0, n, _ROW_BLOCK):
            r1 = min(r0 + _ROW_BLOCK, n)
            m = r1 - r0
            blk = flat[r0:r1, None]
            docs = doc_of[r0:r1]
            bstarts = np.nonzero(np.r_[True, docs[1:] != docs[:-1]])[0]
            rows = docs[bstarts]  # strictly increasing ⇒ unique
            for c in range(0, num_perms, chunk):
                w = min(chunk, num_perms - c)
                np.multiply(blk, a[None, c : c + w], out=mul[:m, :w])
                np.add(mul[:m, :w], b[None, c : c + w], out=mul[:m, :w])
                mins = np.minimum.reduceat(mul[:m, :w], bstarts, axis=0)
                out[rows, c : c + w] = np.minimum(out[rows, c : c + w], mins)
    return out


def batch_simhash(
    flat: np.ndarray, offsets: np.ndarray, work: dict | None = None
) -> np.ndarray:
    """SimHash fingerprints for a CSR batch of shingle sets — uint64
    per doc, bit-identical to :func:`simhash64` (majority per bit, ties
    set the bit; empty set → 0). Blocked per-bit vote sums
    (``np.add.reduceat`` over int32 bit tiles — uint8 would wrap at 256
    shingles) accumulated into a per-doc vote matrix."""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    n = len(flat)
    seg_len = np.diff(offsets)
    if n == 0:
        return out
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), seg_len)
    votes = np.zeros((n_docs, 64), dtype=np.int64)
    bits32 = _workspace(work, "simhash_bits32", (_ROW_BLOCK, 64), np.int32)
    for r0 in range(0, n, _ROW_BLOCK):
        r1 = min(r0 + _ROW_BLOCK, n)
        m = r1 - r0
        # unpackbits has no out=; its ≤512 KB result is same-sized every
        # block, so the allocator recycles it (no fresh-page cost)
        np.copyto(
            bits32[:m],
            np.unpackbits(flat[r0:r1].view(np.uint8).reshape(m, 8), axis=1),
        )
        docs = doc_of[r0:r1]
        bstarts = np.nonzero(np.r_[True, docs[1:] != docs[:-1]])[0]
        rows = docs[bstarts]
        votes[rows] += np.add.reduceat(bits32[:m], bstarts, axis=0)
    nonempty = np.nonzero(seg_len > 0)[0]
    fp_bits = (votes[nonempty] * 2 >= seg_len[nonempty, None]).astype(np.uint8)
    out[nonempty] = np.packbits(fp_bits, axis=1).view(np.uint64).ravel()
    return out


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing signature positions — the MinHash estimator.
    Two empty-set sentinel signatures agree everywhere; call sites
    exclude empty docs (they are handled by exact dedup)."""
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(set_a: np.ndarray, set_b: np.ndarray) -> float:
    """Exact Jaccard of two deduped shingle-hash arrays (oracle path)."""
    if len(set_a) == 0 and len(set_b) == 0:
        return 1.0
    if len(set_a) == 0 or len(set_b) == 0:
        return 0.0
    inter = len(np.intersect1d(set_a, set_b, assume_unique=True))
    return inter / (len(set_a) + len(set_b) - inter)


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash of a shingle-hash set: majority vote per bit
    (Charikar 2002). Empty input → 0."""
    if len(shingles) == 0:
        return 0
    bits = np.unpackbits(shingles.view(np.uint8).reshape(len(shingles), 8), axis=1)
    votes = bits.sum(axis=0)
    fp_bits = (votes * 2 >= len(shingles)).astype(np.uint8)
    return int.from_bytes(np.packbits(fp_bits).tobytes(), "little")


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprint arrays."""
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def band_keys(signatures: np.ndarray, num_bands: int) -> np.ndarray:
    """LSH band keys for a batch of signatures.

    signatures: (n_docs, K) uint64; returns (n_docs, num_bands) uint64
    where each entry mixes that band's r=K/num_bands rows into one key.
    Vectorized across the whole batch.
    """
    n, k = signatures.shape
    r = k // num_bands
    blocks = signatures[:, : num_bands * r].reshape(n, num_bands, r)
    with np.errstate(over="ignore"):
        h = np.full((n, num_bands), _U64(0x51_7C_C1_B7_27_22_0A_95), dtype=np.uint64)
        for j in range(r):
            h = (h ^ blocks[:, :, j]) * _MIX
        # fold band index in so identical row-blocks in different bands
        # don't collide into one bucket
        h = h ^ (np.arange(num_bands, dtype=np.uint64)[None, :] * _MIX)
    return h


def simhash_band_keys(fingerprints: np.ndarray, num_blocks: int = 4) -> np.ndarray:
    """Split 64-bit SimHash fingerprints into ``num_blocks`` bit-blocks
    (candidates for Hamming distance ≤ num_blocks-1 share ≥1 block —
    pigeonhole). Returns (n, num_blocks) uint64 block values."""
    width = 64 // num_blocks
    mask = _U64((1 << width) - 1)
    shifts = (np.arange(num_blocks) * width).astype(np.uint64)
    return (fingerprints[:, None] >> shifts[None, :]) & mask
