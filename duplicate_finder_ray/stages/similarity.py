"""Similarity search over an embedding column (``list<float>``).

Training-data-pipeline extension (no counterpart in the reference,
which is exact-content-only — SURVEY.md §2.5): approximate-nearest-
neighbor top-k and cosine near-duplicate pair detection over the
``embeddings`` table.

Scale shapes:

* ``topk_neighbors`` — the queries are the SMALL side: the query matrix
  is broadcast once with ``ray.put`` and every batch task reads it from
  the object store (never re-shipped per batch). Each batch computes a
  vectorized float64 matmul and emits only its LOCAL top-k per query
  (Q×k rows per batch), so the final per-query reduce sees
  O(num_batches × k) rows — a tiny groupby, never the full score
  matrix.
* ``cosine_pairs`` — brute-force baseline: the normalized corpus matrix
  is broadcast and each batch computes its (B × N) slice of the score
  matrix, emitting only pairs ≥ τ with ``a < b``. O(N²/P) compute per
  task, O(pairs) output. This is the CORRECTNESS baseline; at 10^9+
  vectors use ``lsh_cosine_pairs``.
* ``lsh_cosine_pairs`` — scale path: random-hyperplane LSH (L tables ×
  H bits). Bucket by (table, signature) with the same two-level
  groupby + bucket-cap strategy as the MinHash LSH stage
  (stages/neardup.py), verify exact cosine inside the bucket. Only
  collides vectors whose signs agree on all H hyperplanes of some
  table: P(collide) = (1 - θ/π)^H per table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

PAIRS_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("score", pa.float64())]
)
TOPK_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("vec_id", pa.int64()),
        ("score", pa.float64()),
        ("rank", pa.int64()),
    ]
)


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(B, d) float64 matrix from an embedding column — handles plain
    list<float> (parquet reads) and Ray's ArrowTensorArray extension
    (from_pandas of ndarray cells) alike."""
    c = batch.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if pa.types.is_list(c.type) or pa.types.is_large_list(c.type) or pa.types.is_fixed_size_list(c.type):
        flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(c), -1)
    arr = c.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        return np.vstack(arr).astype(np.float64)
    return np.asarray(arr, dtype=np.float64).reshape(len(c), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def load_query_matrix(
    emb_ds: ray.data.Dataset, query_ids: list[int]
) -> tuple[np.ndarray, np.ndarray]:
    """Collect the (small) query vectors to the driver: (ids, matrix).
    Distributed filter first — only Q rows are ever collected."""
    qset = set(int(q) for q in query_ids)

    def pick(batch: pa.Table) -> pa.Table:
        keep = np.isin(batch.column("vec_id").to_numpy(), list(qset))
        return batch.filter(pa.array(keep))

    qdf = (
        emb_ds.map_batches(pick, batch_format="pyarrow")
        .select_columns(["vec_id", "embedding"])
        .to_pandas()
    )
    qdf = qdf.sort_values("vec_id")
    ids = qdf["vec_id"].to_numpy().astype(np.int64)
    mat = np.vstack(qdf["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def topk_neighbors(
    emb_ds: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Brute-force cosine top-k: for each query id, the k nearest corpus
    vectors by cosine similarity (ties broken by vec_id asc — fully
    deterministic). Returns (query_id, vec_id, score, rank)."""
    qids, qmat = load_query_matrix(emb_ds, query_ids)
    qn = _normalize(qmat)
    q_ref = ray.put((qids, qn))  # broadcast ONCE; tasks read from plasma

    def local_topk(batch: pa.Table) -> pa.Table:
        ids_q, qn = ray.get(q_ref)
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        m = _normalize(_matrix(batch))
        scores = m @ qn.T  # (B, Q) float64
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(ids_q):
            col = scores[:, j]
            mask = vec_ids != qid if exclude_self else np.ones(len(col), bool)
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            take = idx[np.argsort(-col[idx], kind="stable")[:k]]
            out_q.append(np.full(len(take), qid, dtype=np.int64))
            out_v.append(vec_ids[take])
            out_s.append(col[take])
        if not out_q:
            return pa.schema(
                [("query_id", pa.int64()), ("vec_id", pa.int64()), ("score", pa.float64())]
            ).empty_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "score", "rank"]]

    local = emb_ds.map_batches(local_topk, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(global_topk, batch_format="pandas")


def cosine_pairs(
    emb_ds: ray.data.Dataset, threshold: float
) -> ray.data.Dataset:
    """Brute-force near-dup pairs: all (a < b) with cosine ≥ threshold.

    The corpus matrix is broadcast once (``ray.put``); each batch task
    scores its (B × N) slice — distributed O(N²) compute with O(N·d)
    broadcast state and O(pairs) output. Baseline for
    ``lsh_cosine_pairs`` recall checks; fine up to ~10^6 vectors."""
    full = emb_ds.select_columns(["vec_id", "embedding"]).to_pandas()
    full = full.sort_values("vec_id")
    all_ids = full["vec_id"].to_numpy().astype(np.int64)
    all_mat = _normalize(np.vstack(full["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((all_ids, all_mat))

    def score_block(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(ref)
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        m = _normalize(_matrix(batch))
        scores = m @ mat_all.T  # (B, N)
        ii, jj = np.nonzero(scores >= threshold)
        if len(ii) == 0:
            return PAIRS_SCHEMA.empty_table()
        a = vec_ids[ii]
        b = ids_all[jj]
        keep = a < b  # dedupe unordered pairs + drop self
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "score": pa.array(scores[ii[keep], jj[keep]]),
            }
        )

    return emb_ds.map_batches(score_block, batch_format="pyarrow")


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_cosine_pairs(
    emb_ds: ray.data.Dataset,
    threshold: float,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 42,
    bucket_cap: int = 2000,
) -> ray.data.Dataset:
    """Random-hyperplane LSH candidate generation + exact cosine verify.

    Signatures are deterministic (seeded hyperplanes, built once per
    task from the seed — cheap: n_tables × n_bits × d floats). The
    shuffle key is (table, signature); hot buckets are capped at
    ``bucket_cap`` with the true bucket size recorded on every emitted
    pair (observable truncation, per SURVEY.md §7.3)."""

    def sign_batch(batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))
        planes = _hyperplanes(m.shape[1], n_tables, n_bits, seed)
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        n = len(vec_ids)
        tables, sigs, ids, embs = [], [], [], []
        weights = (1 << np.arange(n_bits)).astype(np.uint64)
        for t in range(n_tables):
            bits = (m @ planes[t].T) > 0  # (B, n_bits)
            sig = (bits.astype(np.uint64) * weights).sum(axis=1)
            tables.append(np.full(n, t, dtype=np.int32))
            sigs.append(sig)
            ids.append(vec_ids)
        emb_col = batch.column("embedding")
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        rep = pa.concat_arrays([emb_col] * n_tables)
        return pa.table(
            {
                "table": pa.array(np.concatenate(tables)),
                "sig": pa.array(np.concatenate(sigs), pa.uint64()),
                "vec_id": pa.array(np.concatenate(ids)),
                "embedding": rep,
            }
        )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        size = len(g)
        if size < 2:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="float64"),
                    "bucket_size": pd.Series(dtype="int64"),
                }
            )
        g = g.sort_values("vec_id").head(bucket_cap)
        ids = g["vec_id"].to_numpy().astype(np.int64)
        m = _normalize(np.vstack(g["embedding"].to_numpy()).astype(np.float64))
        s = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = s[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "a": ids[ia[keep]],
                "b": ids[ib[keep]],
                "score": s[ia[keep], ib[keep]],
                "bucket_size": np.full(int(keep.sum()), size, dtype=np.int64),
            }
        )

    signed = emb_ds.map_batches(sign_batch, batch_format="pyarrow")
    pairs = signed.groupby(["table", "sig"]).map_groups(
        emit_pairs, batch_format="pandas"
    )

    # dedupe across tables (same pair may collide in several tables)
    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["a", "b"], sort=False)
            .agg(score=("score", "max"), bucket_size=("bucket_size", "max"))
            .reset_index()
        )

    return pairs.groupby("a").map_groups(dedupe, batch_format="pandas")
