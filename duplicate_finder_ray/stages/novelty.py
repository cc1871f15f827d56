"""Per-document novelty: how much of a document's k-gram content is
unique to it corpus-wide.

Curation signal from the web-corpus playbook (the complement of
boilerplate share): a doc whose shingles all appear in other documents
is template/duplicate material; a doc with a high unique-shingle share
carries new content. Emits exact integers (doc_id, n_shingles,
n_unique) — novelty = n_unique / n_shingles is the caller's division,
so the DuckDB oracle gates bit-exact counts.

Scale shape (the paragraph-dedup pattern at shingle granularity):

1. per-batch: distinct k-gram shingle hashes per doc via the
   Shingler's batch CSR kernel in SQL-parity ASCII mode
   (`functions/shingles.py` — provably the same sets as DuckDB's
   `regexp_extract_all` + slice CTE); emit slim (hash u64, doc i64)
   rows — 16 B per distinct shingle, never text;
2. ONE hash-keyed exchange co-locates equal shingles; each partition
   computes document frequency per hash locally (all copies of a hash
   are present) and collapses to per-doc partials
   (doc, n_shingles_part, n_unique_part);
3. one tiny doc-keyed groupby-sum.

Shingle identity is the rolling 64-bit k-gram hash — the same
identity every n-gram operator in the engine uses and the hash-match
gate certifies against the text-keyed SQL twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from duplicate_finder_ray.functions.shingles import Shingler
from duplicate_finder_ray.stages.exchange import hash_exchange

_SLIM = pa.schema([("h", pa.uint64()), ("doc", pa.int64())])
_PART = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_shingles", pa.int64()),
        ("n_unique", pa.int64()),
    ]
)


def novelty_counts(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(doc_id, n_shingles, n_unique) per document with ≥1 k-gram —
    see module docstring."""
    if k <= 0:
        raise ValueError("k must be positive")
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    K = k

    def slim(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _SLIM.empty_table()
        sh = Shingler(k=K)
        flat, offs = sh.shingle_hashes_batch_column(
            batch[text_col], ascii_only=True
        )
        counts = np.diff(offs)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(flat, pa.uint64()),
                "doc": pa.array(np.repeat(ids, counts), pa.int64()),
            }
        )

    slim_ds = ds.select_columns([id_col, text_col]).map_batches(
        slim, batch_format="pyarrow"
    )

    def h_part(tbl: pa.Table, p: int) -> np.ndarray:
        h = tbl.column("h").to_numpy().astype(np.uint64)
        return (h % np.uint64(p)).astype(np.int64)

    def doc_partials(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return _PART.empty_table()
        h = tbl.column("h").to_numpy().astype(np.uint64)
        doc = tbl.column("doc").to_numpy().astype(np.int64)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        starts = np.nonzero(np.r_[True, hs[1:] != hs[:-1]])[0]
        df = np.diff(np.append(starts, len(hs)))
        # rows are per-doc DISTINCT shingles, so rows-per-hash = doc freq
        unique_row = np.empty(len(hs), dtype=bool)
        unique_row[order] = np.repeat(df == 1, df)
        import pandas as pd

        g = (
            pd.DataFrame(
                {
                    "doc_id": doc,
                    "n_shingles": np.int64(1),
                    "n_unique": unique_row.astype(np.int64),
                }
            )
            .groupby("doc_id", sort=False)
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    partials = hash_exchange(
        slim_ds, h_part, num_partitions, doc_partials, _PART.empty_table()
    )
    return partials.groupby("doc_id").aggregate(
        Sum("n_shingles", alias_name="n_shingles"),
        Sum("n_unique", alias_name="n_unique"),
    )
