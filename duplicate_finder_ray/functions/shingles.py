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

_MIX = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio odd constant
_U64 = np.uint64
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def token_id(token: str) -> int:
    """Stable 64-bit id of a token (blake2b 8-byte digest)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"
    )


class Shingler:
    """Tokenize + k-shingle hash with a memoised token vocabulary.

    mode: "token" (``\\w+`` word tokens), "line" (non-blank lines), or
    "char" (k applies to characters, hashed in sliding windows).
    """

    def __init__(self, k: int = 5, mode: str = "token") -> None:
        if mode not in ("token", "line", "char"):
            raise ValueError(f"invalid shingle mode: {mode}")
        self.k = k
        self.mode = mode
        self._vocab: dict[str, int] = {}

    def _ids(self, units: list[str]) -> np.ndarray:
        vocab = self._vocab
        out = np.empty(len(units), dtype=np.uint64)
        for i, u in enumerate(units):
            h = vocab.get(u)
            if h is None:
                h = token_id(u)
                vocab[u] = h
            out[i] = h
        return out

    def units(self, text: str) -> list[str]:
        if self.mode == "token":
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
