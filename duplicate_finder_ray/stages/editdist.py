"""Edit-distance verification for fuzzy duplicate pairs.

The MinHash/n-gram family measures SET similarity; edit distance
measures SEQUENCE similarity — the gate that separates "same tokens,
reshuffled" from "the same document with a few character edits"
(version bumps, typo fixes, whitespace churn). The reference engine has
no fuzzy matching at all (byte-exact comparison only,
/root/reference/duplicate_finder/duplicate_finder.py:176-204); this is
part of the beyond-reference dedup toolkit.

Kernel: Myers' bit-parallel Levenshtein (Myers, JACM 1999 — public
algorithm), O(n·m/w) word ops instead of the O(n·m) DP matrix, using
Python's arbitrary-width ints as the bit vector so any pattern length
works in one lane. Distances are computed over UTF-8 BYTES, matching
DuckDB's levenshtein() unit so the SQL oracle is bit-exact.

Scale shape: candidate pairs come from the n-gram/LSH stages (never
all-pairs); the pair endpoints' contents are fetched via a broadcast
semi-join of ONLY the paired doc ids (≤ 2·pairs rows — cluster members,
not the corpus) and scoring distributes over pair batches. At 10^9-doc
scale the content fetch would move to the ``fid % n_shards`` split
exchange proven in stages/neardup.py:verify_pairs_exact; the broadcast
is correct while Σ|paired contents| fits one object (documented bound,
same as the n-gram baseline's postings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def myers_levenshtein(a: bytes, b: bytes) -> int:
    """Exact unit-cost Levenshtein distance between two byte strings
    via Myers' bit-parallel algorithm; one unbounded-int bit lane over
    the shorter string."""
    if a == b:
        return 0
    if len(a) > len(b):  # pattern = shorter side (bit vector width)
        a, b = b, a
    m = len(a)
    if m == 0:
        return len(b)
    peq = {}
    for i, ch in enumerate(a):
        peq[ch] = peq.get(ch, 0) | (1 << i)
    mask = (1 << m) - 1
    high = 1 << (m - 1)
    pv = mask
    mv = 0
    score = m
    for ch in b:
        eq = peq.get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (mask & ~(xh | pv))
        mh = pv & xh
        if ph & high:
            score += 1
        elif mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (mask & ~(xv | ph))
        mv = ph & xv
    return score


def _endpoint_contents(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str,
    text_col: str,
):
    """Broadcast semi-join: one object holding (id, content) for ONLY
    the docs named by the candidate pairs."""
    from duplicate_finder_ray.stages.relational import collect_small_side

    keys_ref = collect_small_side(pairs, ["a", "b"])

    def keep(batch: pa.Table) -> pa.Table:
        kt = ray.get(keys_ref)
        wanted = set(kt.column("a").to_pylist())
        wanted.update(kt.column("b").to_pylist())
        ids = batch.column(id_col).to_pylist()
        m = np.fromiter((i in wanted for i in ids), dtype=bool, count=len(ids))
        return batch.select([id_col, text_col]).filter(pa.array(m))

    return collect_small_side(
        docs.map_batches(keep, batch_format="pyarrow"), [id_col, text_col]
    )


def edit_distance_pairs(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str,
    text_col: str,
    max_dist: int,
) -> ray.data.Dataset:
    """For each candidate pair (a, b), the exact byte-level Levenshtein
    distance between the two documents, keeping pairs with
    ``lev ≤ max_dist`` — the sequence-level verify stage behind fuzzy
    dedup. Identical contents short-circuit to 0 without touching the
    DP; each pair costs O(n·m/w) bit-ops, distributed over pair
    batches."""
    content_ref = _endpoint_contents(docs, pairs, id_col, text_col)

    def score(batch: pa.Table) -> pa.Table:
        ct = ray.get(content_ref)
        lut = dict(
            zip(ct.column(id_col).to_pylist(), ct.column(text_col).to_pylist())
        )
        a_ids = batch.column("a").to_pylist()
        b_ids = batch.column("b").to_pylist()
        out_a: list[str] = []
        out_b: list[str] = []
        out_d: list[int] = []
        for a, b in zip(a_ids, b_ids):
            d = myers_levenshtein(
                (lut[a] or "").encode(), (lut[b] or "").encode()
            )
            if d <= max_dist:
                out_a.append(a)
                out_b.append(b)
                out_d.append(d)
        return pa.table(
            {
                "a": pa.array(out_a, pa.string()),
                "b": pa.array(out_b, pa.string()),
                "lev": pa.array(out_d, pa.int64()),
            }
        )

    return pairs.select_columns(["a", "b"]).map_batches(
        score, batch_format="pyarrow"
    )
