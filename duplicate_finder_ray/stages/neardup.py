"""Near-duplicate detection stages: signatures → LSH bands → candidate
pairs → verified pairs.

North_rule extension (no counterpart in the reference, which is
exact-only — SURVEY.md §2.5): MinHash shingle signatures and SimHash
fingerprints per file, LSH banding to generate candidate pairs, and
signature-based verification at threshold τ.

Execution shape:

* ``SignatureStage`` is a CALLABLE CLASS → Ray actor pool. The shingler
  vocab cache and the (a, b) permutation tables are built once per actor
  (``__init__``), then every batch reuses them (stateful-stage rule,
  ray_guide 'Stateful stages = actor pools').
* Band explosion is a stateless vectorized map_batches (n_docs × bands
  rows out).
* Candidate generation is ONE shuffle on ``(band, band_hash)`` — the
  skewed shuffle of this engine — or, below
  ``band_exchange_broadcast_limit`` band rows, one fused remote lexsort
  task with zero barriers. Hot buckets (license headers, generated
  code) are capped per emission task at the ``band_pair_budget``-derived
  member cap (``band_bucket_cap=None``, the default — truncates NOTHING
  while the task's pair volume fits the budget) or at an explicit
  ``band_bucket_cap``: pairs are emitted only among the first cap
  members (by file_id), every emitted pair carries the TRUE
  ``bucket_size``, and a binding cap warns loudly — truncation is
  observable, never silent (SURVEY.md §7.3). Multiple bands keep recall
  up for capped buckets.
* Pair verification re-reads NOTHING: exact mode scores candidate pairs
  against the shingle sets already emitted by the signature pass,
  assembled into CSR buffers in remote tasks (broadcast below
  ``broadcast_verify_limit`` endpoints, a ``fid % n_shards``-partitioned
  shard exchange above it); estimate mode hash-joins the minhash columns
  and filters on the Jaccard estimate ≥ τ.
"""

from __future__ import annotations

import logging
import warnings

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.functions.hashing import stable_hash_array
from duplicate_finder_ray.functions.shingles import (
    Shingler,
    band_keys,
    estimated_jaccard,
    minhash_params,
    batch_minhash,
    batch_simhash,
    simhash_band_keys,
)

#: candidate pairs flow as compact uint64 surrogate ids ("fid" =
#: fixed-key siphash64 of file_id) — the skewed band exchange and the
#: pair tables never ship the long file_id strings; translation back to
#: strings happens once, at the verified-pair boundary, via a broadcast
#: (sorted fids, file_ids) map. Collision odds are the usual 64-bit
#: birthday bound (~n²/2⁶⁵ — negligible to ~10^8 files; at 10^12-file
#: scale swap fid for a 128-bit digest pair, the plumbing is unchanged).
PAIRS_SCHEMA = pa.schema(
    [
        ("a", pa.uint64()),
        ("b", pa.uint64()),
        ("bucket_size", pa.int64()),
    ]
)

_EMPTY_PAIRS = PAIRS_SCHEMA.empty_table()

#: deduped candidate pairs (uint64 fids + band-collision count)
CAND_SCHEMA = pa.schema(
    [
        ("a", pa.uint64()),
        ("b", pa.uint64()),
        ("n_bands", pa.int64()),
        ("bucket_size", pa.int64()),
    ]
)

VERIFIED_SCHEMA = pa.schema(
    [
        ("a", pa.string()),
        ("b", pa.string()),
        ("n_bands", pa.int64()),
        ("jaccard", pa.float64()),
        # exact shingle-set intersection/union sizes — integer twins of
        # ``jaccard`` (= n_inter / n_union) that survive any float
        # canonicalization; -1 on the estimate path (no sets in hand)
        ("n_inter", pa.int64()),
        ("n_union", pa.int64()),
    ]
)


def fid_of(ids: np.ndarray) -> np.ndarray:
    """uint64 surrogate id per file_id string — vectorized fixed-key
    siphash (deterministic across processes/nodes)."""
    return stable_hash_array(np.asarray(ids, dtype=object))


def effective_parallelism(cfg: PipelineConfig) -> int:
    """cfg.parallelism clamped to the CPUs the current Ray session
    actually has — a fixed pool/partition count larger than the session
    starves or deadlocks small sessions."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", cfg.parallelism))
    except Exception:
        cpus = cfg.parallelism
    return max(2, min(cfg.parallelism, cpus))


def pool_size(cfg: PipelineConfig) -> int:
    """FIXED actor-pool size for compute stages: session CPUs minus
    headroom for the source read tasks. Fixed beats autoscaling here —
    Ray's (1, N) pool ramps up one actor at a time and spends most of a
    short stage below capacity (measured: 10s → 5.6s on the signature
    stage at 32 CPUs); reserving a slice of CPUs keeps the upstream read
    from starving (a full-width pool deadlocks the stage)."""
    par = effective_parallelism(cfg)
    return max(2, par - max(2, par // 8))


class SignatureStage:
    """Actor-pool stage: content → (minhash list<uint64>[K], simhash
    uint64, n_shingles). Shingler vocab + permutation tables persist
    across batches."""

    def __init__(self, cfg: PipelineConfig, emit_shingles: bool = False) -> None:
        self.shingler = Shingler(
            k=cfg.shingle_k, mode=cfg.shingle_mode, token_hash=cfg.token_hash
        )
        self.a, self.b = minhash_params(cfg.minhash_perms, cfg.minhash_seed)
        self.num_perms = cfg.minhash_perms
        #: also emit the deduped shingle set (uint64-LE bytes) per row —
        #: shingling is the expensive part, so exact-verify reuses these
        #: instead of a SECOND full content read+shingle pass
        self.emit_shingles = emit_shingles
        #: persistent kernel workspaces — fresh large temps fault pages
        #: at single-digit MB/s in this sandbox; actor state reuses them
        self._work: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        # whole-batch CSR kernels (shingle_hashes_batch_column /
        # batch_minhash / batch_simhash) — bit-identical to the per-doc
        # functions (property-tested); ASCII token batches tokenize
        # entirely in Arrow C (no per-token Python strings)
        flat, offsets = self.shingler.shingle_hashes_batch_column(
            batch.column("content")
        )
        sigs = batch_minhash(flat, offsets, self.a, self.b, work=self._work)
        simhashes = batch_simhash(flat, offsets, work=self._work)
        n_shingles = np.diff(offsets)
        out = batch.drop_columns(["content"])
        out = out.append_column(
            "fid",
            pa.array(
                fid_of(batch.column("file_id").to_numpy(zero_copy_only=False)),
                pa.uint64(),
            ),
        )
        out = out.append_column(
            "minhash",
            pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), type=pa.uint64()), self.num_perms
            ),
        )
        out = out.append_column("simhash", pa.array(simhashes, type=pa.uint64()))
        out = out.append_column("n_shingles", pa.array(n_shingles, type=pa.int64()))
        if self.emit_shingles:
            # the CSR form IS the large_binary layout (uint64-LE values,
            # byte offsets = 8 × set offsets) — build the column
            # zero-copy from the kernel's buffers
            shingle_col = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                n,
                [None, pa.py_buffer(offsets * 8), pa.py_buffer(flat)],
            )
            out = out.append_column("shingles", shingle_col)
        return out


def signatures(
    ds: ray.data.Dataset, cfg: PipelineConfig, emit_shingles: bool = False
) -> ray.data.Dataset:
    """Run the signature actor pool over a dataset bearing
    (file_id, content)."""
    return ds.map_batches(
        SignatureStage,
        fn_constructor_args=(cfg, emit_shingles),
        batch_format="pyarrow",
        batch_size=cfg.derive_batch_size,
        concurrency=pool_size(cfg),
        num_cpus=1,
    )


def _minhash_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("minhash")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # copy=False: the flattened uint64 child array is already the right
    # dtype — an unconditional astype would copy the whole signature
    # block (this sandbox faults fresh pages at ~80 MB/s)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(
        np.uint64, copy=False
    )
    return flat.reshape(len(batch), -1)


def explode_bands(ds: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """(fid, minhash) → (band_hash, fid) × num_bands rows. Docs with
    zero shingles are excluded — the empty-set sentinel signature would
    otherwise bucket all short docs together.

    The exchange rows are TWO uint64s: band_keys() folds the band index
    into the hash itself, and the file identity travels as the compact
    fid surrogate, not the file_id string — the skewed exchange moves
    bands × corpus rows, so every byte here is multiplied by both."""
    return ds.map_batches(
        make_band_explode(cfg), batch_format="pyarrow"
    )


def make_band_explode(cfg: PipelineConfig):
    """The (fid, minhash, n_shingles) → (band_hash, fid) × bands kernel,
    shared by ``explode_bands`` (standalone map_batches) and the fused
    band exchange (``hash_exchange`` premap — the exploded rows are
    born inside the split task and never materialize as an
    intermediate dataset)."""
    num_bands = cfg.resolved_lsh_bands

    def explode(batch: pa.Table) -> pa.Table:
        if "n_shingles" in batch.column_names:
            batch = batch.filter(pa.compute.greater(batch["n_shingles"], 0))
        if len(batch) == 0:
            return pa.table(
                {
                    "band_hash": pa.array([], pa.uint64()),
                    "fid": pa.array([], pa.uint64()),
                }
            )
        sigs = _minhash_matrix(batch)
        keys = band_keys(sigs, num_bands)  # (n, bands)
        fids = batch.column("fid").to_numpy().astype(np.uint64)
        return pa.table(
            {
                "band_hash": pa.array(keys.reshape(-1), pa.uint64()),
                "fid": pa.array(np.repeat(fids, num_bands), pa.uint64()),
            }
        )

    return explode


def derive_bucket_cap(sizes: np.ndarray, budget: int) -> int:
    """Largest per-bucket member cap such that total emitted pairs
    Σ C(min(size, cap), 2) stay within ``budget`` — the recall-safe
    replacement for a fixed member cap: when the task's pair volume
    fits the budget NOTHING is truncated (cap = max bucket size), and
    when it doesn't the cap degrades gracefully instead of silently
    guillotining every near-clique at a magic constant (the failure
    mode the sf0.1 density probe exposed for the old fixed default).
    Monotone in cap ⇒ binary search; never below 2 so every overflowed
    bucket still emits pairs carrying its TRUE size downstream."""
    if len(sizes) == 0:
        return 2
    smax = int(sizes.max())
    if smax <= 2:
        return 2
    sizes = sizes.astype(np.int64)

    def n_pairs(m: int) -> int:
        c = np.minimum(sizes, m)
        return int((c * (c - 1) // 2).sum())

    if n_pairs(smax) <= budget:
        return smax
    lo, hi = 2, smax
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if n_pairs(mid) <= budget:
            lo = mid
        else:
            hi = mid - 1
    return lo


def warn_bucket_overflow(
    sizes: np.ndarray, cap: int, kind: str = "LSH"
) -> None:
    """LOUD recall-risk signal when a cap actually binds: pairs among
    members beyond the cap are never emitted, so recall can silently
    drop. Emitted via warnings + logging in whatever process runs the
    kernel (driver for the fused path, worker for exchange reduces —
    worker logs stream to the driver in local mode)."""
    over = sizes > cap
    n_over = int(over.sum())
    if n_over == 0:
        return
    dropped = int((sizes[over] - cap).sum())
    msg = (
        f"{kind} bucket cap {cap} BINDING: {n_over} bucket(s) overflow "
        f"(max size {int(sizes.max())}), {dropped} member slot(s) "
        f"truncated — candidate recall may drop; raise band_pair_budget "
        f"/ band_bucket_cap or check for degenerate content. True "
        f"bucket_size is recorded on every emitted pair."
    )
    warnings.warn(msg, RuntimeWarning, stacklevel=3)
    logging.getLogger(__name__).warning(msg)


def bucket_pairs_arrays(
    bh: np.ndarray,
    ids: np.ndarray,
    cap: int | None,
    budget: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized pair emission over a band-row array: lexsort by
    (band_hash, fid), cap each bucket at ``cap`` members (or, when cap
    is None, at the pair-budget-derived cap — see derive_bucket_cap),
    emit all intra-bucket pairs per distinct capped size (np.triu
    block trick). Returns raw (a, b, true_bucket_size) — NOT yet
    deduped across bands. Shared by the fused candidate path and the
    incremental probe. A binding cap warns loudly (never silent)."""
    none = (
        np.empty(0, dtype=np.uint64),
        np.empty(0, dtype=np.uint64),
        np.empty(0, dtype=np.int64),
    )
    if len(bh) == 0:
        return none
    order = np.lexsort((ids, bh))
    bh, ids = bh[order], ids[order]
    first = np.empty(len(bh), dtype=bool)
    first[0] = True
    np.not_equal(bh[1:], bh[:-1], out=first[1:])
    starts = np.nonzero(first)[0]
    sizes = np.diff(np.append(starts, len(bh)))
    if cap is None:
        cap = derive_bucket_cap(sizes, budget or 10_000_000)
    warn_bucket_overflow(sizes, cap)
    capped = np.minimum(sizes, cap)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_sz: list[np.ndarray] = []
    for m in np.unique(capped):
        if m < 2:
            continue
        sel = capped == m
        st = starts[sel]
        ia, ib = np.triu_indices(int(m), k=1)
        out_a.append(ids[(st[:, None] + ia[None, :]).ravel()])
        out_b.append(ids[(st[:, None] + ib[None, :]).ravel()])
        out_sz.append(np.repeat(sizes[sel], len(ia)))
    if not out_a:
        return none
    return (
        np.concatenate(out_a),
        np.concatenate(out_b),
        np.concatenate(out_sz).astype(np.int64),
    )


def dedupe_pair_arrays(
    a: np.ndarray, b: np.ndarray, sz: np.ndarray
) -> pa.Table:
    """Cross-band dedupe of raw pair arrays by run-length reduce:
    (a, b, n_bands = collision count, bucket_size = max true size)."""
    if len(a) == 0:
        return CAND_SCHEMA.empty_table()
    order = np.lexsort((b, a))
    a, b, sz = a[order], b[order], sz[order]
    first = np.empty(len(a), dtype=bool)
    first[0] = True
    np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=first[1:])
    pstarts = np.nonzero(first)[0]
    n_bands = np.diff(np.append(pstarts, len(a))).astype(np.int64)
    bucket = np.maximum.reduceat(sz, pstarts)
    return pa.table(
        {
            "a": pa.array(a[pstarts], pa.uint64()),
            "b": pa.array(b[pstarts], pa.uint64()),
            "n_bands": pa.array(n_bands),
            "bucket_size": pa.array(bucket),
        }
    )


def candidate_pairs(
    band_rows: ray.data.Dataset,
    cfg: PipelineConfig,
    sigs_source: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Band buckets → unordered candidate pairs (a < b, uint64 fids),
    deduped across bands with a band-collision count (``n_bands`` — a
    free similarity signal).

    TWO-LEVEL grouping: the shuffle key is a coarse partition id
    (``band_hash % P``), and the real (band, band_hash) bucketing runs
    VECTORIZED (pandas C groupby) inside each partition. A naive
    ``groupby(band, band_hash).map_groups`` pays a Python call per
    bucket — ~3 ms × millions of buckets; this pays P calls total.
    band_hash is uniform (mixed uint64), so partitions balance; hot
    BUCKETS inside a partition are capped at ``band_bucket_cap`` (or
    the ``band_pair_budget``-derived cap when it is None — the
    default, which truncates NOTHING while a task's pair volume fits
    the budget) with the true bucket size recorded on every emitted
    pair and a loud warning whenever a cap binds (never silent).
    """
    cap = cfg.band_bucket_cap
    budget = cfg.band_pair_budget
    num_parts = effective_parallelism(cfg) * 2

    # FUSED-EXPLODE EXCHANGE: when the caller hands the MATERIALIZED
    # signature table and its band-row volume is certain to exceed the
    # fused-lexsort limit, run the band exchange directly over the
    # signature blocks with the explode kernel as the split-side premap
    # — the exploded (band_hash, fid) table is born inside the split
    # tasks and never materializes as an intermediate dataset (saves a
    # full object-store write + read of bands × corpus rows).
    if sigs_source is not None:
        try:
            n_docs = sigs_source.count()  # metadata on materialized ds
        except Exception:
            n_docs = None
        if (
            n_docs is not None
            and n_docs * cfg.resolved_lsh_bands
            > cfg.band_exchange_broadcast_limit
        ):
            from duplicate_finder_ray.stages.exchange import hash_exchange

            explode_fn = make_band_explode(cfg)

            def premap(block: pa.Table) -> pa.Table:
                cols = [
                    c
                    for c in ("fid", "minhash", "n_shingles")
                    if c in block.column_names
                ]
                return explode_fn(block.select(cols))

            def band_part_f(tbl: pa.Table, n: int) -> np.ndarray:
                return (
                    tbl.column("band_hash").to_numpy().astype(np.uint64)
                    % np.uint64(n)
                ).astype(np.int64)

            def emit_reduce_f(p: int, tbl: pa.Table) -> pa.Table:
                a, b, sz = bucket_pairs_arrays(
                    tbl.column("band_hash").to_numpy().astype(np.uint64),
                    tbl.column("fid").to_numpy().astype(np.uint64),
                    cap,
                    budget,
                )
                if len(a) == 0:
                    return _EMPTY_PAIRS
                return pa.table(
                    {
                        "a": pa.array(a, pa.uint64()),
                        "b": pa.array(b, pa.uint64()),
                        "bucket_size": pa.array(sz.astype(np.int64)),
                    }
                )

            pairs = hash_exchange(
                sigs_source,
                band_part_f,
                num_parts,
                emit_reduce_f,
                _EMPTY_PAIRS,
                premap=premap,
            )
            return _dedupe_candidates(pairs, cfg, num_parts)

    # SMALL-INPUT FUSED PATH: below ``band_exchange_broadcast_limit``
    # band rows (2 uint64 cols — 16 B/row), ONE remote task lexsorts the
    # whole exchange, emits capped pairs per bucket run AND dedupes them
    # across bands in the same pass — zero shuffle barriers (the
    # sort-shuffle's sample/exchange fixed cost is CPU-count-independent
    # and dominates small inputs). Past the limit the two-level coarse
    # pkey shuffle below remains the 10^12-scale shape. Same pattern as
    # the pair-dedupe broadcast path; both record the true bucket_size.
    band_rows = band_rows.materialize()
    try:
        n_band_rows = band_rows.count()
    except Exception:
        n_band_rows = None

    if (
        n_band_rows is not None
        and n_band_rows <= cfg.band_exchange_broadcast_limit
    ):
        out_parts = int(min(num_parts, max(1, n_band_rows // 10_000 + 1)))

        @ray.remote
        def fused_bucket_pairs(*blocks: pa.Table):
            empty = CAND_SCHEMA.empty_table()
            blocks = tuple(
                b for b in blocks if "band_hash" in b.column_names and len(b)
            )
            if not blocks:
                outs = [empty] * out_parts
                return outs[0] if out_parts == 1 else tuple(outs)
            tbl = pa.concat_tables(blocks)
            a, b, sz = bucket_pairs_arrays(
                tbl.column("band_hash").to_numpy().astype(np.uint64),
                tbl.column("fid").to_numpy().astype(np.uint64),
                cap,
                budget,
            )
            if len(a) == 0:
                outs = [empty] * out_parts
                return outs[0] if out_parts == 1 else tuple(outs)
            out = dedupe_pair_arrays(a, b, sz)
            step = (len(out) + out_parts - 1) // out_parts
            outs = [out.slice(i * step, step) for i in range(out_parts)]
            outs = [o if len(o) else empty for o in outs]
            return outs[0] if out_parts == 1 else tuple(outs)

        refs = band_rows.to_arrow_refs()
        out_refs = fused_bucket_pairs.options(num_returns=out_parts).remote(
            *refs
        )
        if out_parts == 1:
            out_refs = [out_refs]
        return ray.data.from_arrow_refs(list(out_refs))

    # --- scale path: barrier-free hash exchange (stages/exchange.py) ---
    # band_hash already folds the band index in, so it alone is the
    # bucket key; partitioning by band_hash % P keeps buckets whole.
    # Ray Data's sort-based groupby would sample+sort the 16-byte rows
    # for an order nothing needs; the raw-task exchange has no barrier
    # and each reduce runs the SAME vectorized kernel the fused path
    # uses (path equality is test-guarded).
    from duplicate_finder_ray.stages.exchange import hash_exchange

    def band_part(tbl: pa.Table, n: int) -> np.ndarray:
        return (
            tbl.column("band_hash").to_numpy().astype(np.uint64)
            % np.uint64(n)
        ).astype(np.int64)

    def emit_reduce(p: int, tbl: pa.Table) -> pa.Table:
        a, b, sz = bucket_pairs_arrays(
            tbl.column("band_hash").to_numpy().astype(np.uint64),
            tbl.column("fid").to_numpy().astype(np.uint64),
            cap,
            budget,
        )
        if len(a) == 0:
            return _EMPTY_PAIRS
        return pa.table(
            {
                "a": pa.array(a, pa.uint64()),
                "b": pa.array(b, pa.uint64()),
                "bucket_size": pa.array(sz.astype(np.int64)),
            }
        )

    pairs = hash_exchange(
        band_rows, band_part, num_parts, emit_reduce, _EMPTY_PAIRS
    )
    return _dedupe_candidates(pairs, cfg, num_parts)


def _dedupe_candidates(
    pairs: ray.data.Dataset, cfg: PipelineConfig, num_parts: int
) -> ray.data.Dataset:
    """Cross-band pair dedupe shared by the band-row exchange path and
    the fused-explode exchange path (identical semantics)."""
    # dedupe pairs across bands. The raw (pre-dedupe) pair table is
    # orders of magnitude smaller than the band exchange, so up to
    # ``pair_dedupe_broadcast_limit`` rows ONE remote task lexsorts the
    # uint64 pairs and reduces runs with np.maximum.reduceat — replacing
    # a whole sort-shuffle barrier (its fixed cost is CPU-count
    # independent and was a measured scaling-efficiency drag). The
    # result is split into ``num_parts`` blocks so downstream scoring
    # parallelizes. Past the limit, the distributed two-level shuffle
    # path below remains the 10^12-scale shape.
    raw = pairs.materialize()
    try:
        n_raw = raw.count()
    except Exception:
        n_raw = None

    if n_raw is not None and n_raw <= cfg.pair_dedupe_broadcast_limit:
        out_parts = int(min(num_parts, max(1, n_raw // 1_000 + 1)))

        @ray.remote
        def dedupe_task(*blocks: pa.Table):
            empty = CAND_SCHEMA.empty_table()
            blocks = tuple(
                b for b in blocks if "a" in b.column_names and len(b)
            )
            if not blocks:
                outs = [empty] * out_parts
                return outs[0] if out_parts == 1 else tuple(outs)
            tbl = pa.concat_tables(blocks)
            a = tbl.column("a").to_numpy().astype(np.uint64)
            b = tbl.column("b").to_numpy().astype(np.uint64)
            sz = tbl.column("bucket_size").to_numpy().astype(np.int64)
            order = np.lexsort((b, a))
            a, b, sz = a[order], b[order], sz[order]
            first = np.empty(len(a), dtype=bool)
            first[0] = True
            np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=first[1:])
            starts = np.nonzero(first)[0]
            n_bands = np.diff(np.append(starts, len(a))).astype(np.int64)
            bucket = np.maximum.reduceat(sz, starts)
            out = pa.table(
                {
                    "a": pa.array(a[starts], pa.uint64()),
                    "b": pa.array(b[starts], pa.uint64()),
                    "n_bands": pa.array(n_bands),
                    "bucket_size": pa.array(bucket),
                }
            )
            step = (len(out) + out_parts - 1) // out_parts
            outs = [out.slice(i * step, step) for i in range(out_parts)]
            outs = [o if len(o) else empty for o in outs]
            return outs[0] if out_parts == 1 else tuple(outs)

        refs = raw.to_arrow_refs()
        out_refs = dedupe_task.options(num_returns=out_parts).remote(*refs)
        if out_parts == 1:
            out_refs = [out_refs]
        return ray.data.from_arrow_refs(list(out_refs))

    # distributed fallback: barrier-free hash exchange keyed on the
    # FULL (a, b) pair (fixed-key siphash mix — a hub file that
    # near-matches much of the corpus would otherwise funnel its pairs
    # into one partition), reduced by the same run-length kernel the
    # single-task path uses.
    from duplicate_finder_ray.stages.exchange import hash_exchange

    def pair_part(tbl: pa.Table, n: int) -> np.ndarray:
        av = tbl.column("a").to_numpy().astype(np.uint64)
        bv = tbl.column("b").to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = pd.util.hash_array(av * np.uint64(0x9E3779B97F4A7C15) ^ bv)
        return (h % np.uint64(n)).astype(np.int64)

    def dedupe_reduce(p: int, tbl: pa.Table) -> pa.Table:
        return dedupe_pair_arrays(
            tbl.column("a").to_numpy().astype(np.uint64),
            tbl.column("b").to_numpy().astype(np.uint64),
            tbl.column("bucket_size").to_numpy().astype(np.int64),
        )

    return hash_exchange(
        raw, pair_part, num_parts, dedupe_reduce, CAND_SCHEMA.empty_table()
    )


@ray.remote
def _build_fid_map(*blocks: pa.Table) -> tuple:
    """(sorted fids, file_ids aligned) from signature blocks — built in
    the cluster; the driver only passes refs around."""
    blocks = tuple(b for b in blocks if "fid" in b.column_names and len(b))
    if not blocks:
        return np.empty(0, np.uint64), np.empty(0, dtype=object)
    tbl = pa.concat_tables([b.select(["fid", "file_id"]) for b in blocks])
    tbl = tbl.sort_by("fid")
    return (
        tbl.column("fid").to_numpy().astype(np.uint64),
        tbl.column("file_id").to_numpy(zero_copy_only=False),
    )


def fid_map_ref(sigs: ray.data.Dataset):
    """Broadcast fid → file_id lookup (one remote build task over the
    materialized signature blocks)."""
    refs = sigs.materialize().to_arrow_refs()
    if not refs:
        return ray.put((np.empty(0, np.uint64), np.empty(0, dtype=object)))
    return _build_fid_map.remote(*refs)


def translate_pairs(
    pairs: ray.data.Dataset, sigs: ray.data.Dataset
) -> ray.data.Dataset:
    """uint64 (a, b) pair columns → file_id strings, re-canonicalized to
    a < b in STRING order (fid order and lexicographic order differ).
    Other columns pass through."""
    map_ref = fid_map_ref(sigs)

    def to_strings(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            names = batch.column_names
            return pa.schema(
                [
                    (n, pa.string() if n in ("a", "b") else batch.schema.field(n).type)
                    for n in names
                ]
            ).empty_table()
        fids, names_arr = ray.get(map_ref)
        aa = batch.column("a").to_numpy().astype(np.uint64)
        bb = batch.column("b").to_numpy().astype(np.uint64)
        sa = names_arr[np.searchsorted(fids, aa)]
        sb = names_arr[np.searchsorted(fids, bb)]
        swap = sa > sb
        lo = np.where(swap, sb, sa)
        hi = np.where(swap, sa, sb)
        out = batch.drop_columns(["a", "b"])
        out = out.append_column("a", pa.array(lo, pa.string()))
        out = out.append_column("b", pa.array(hi, pa.string()))
        return out.select(["a", "b", *[c for c in batch.column_names if c not in ("a", "b")]])

    return pairs.map_batches(to_strings, batch_format="pyarrow")


def verify_pairs(
    pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    """Attach both endpoints' signatures (two hash-partitioned joins on
    the uint64 fid) and keep pairs whose MinHash Jaccard estimate ≥ τ.

    Output: (a, b, n_bands, jaccard) with STRING ids — the joins carry
    file_id as payload, so translation back from fids is free here.
    jaccard is the MinHash ESTIMATE (σ ≈ 0.035 at K=128). Only the
    (small) pair table and the signature table shuffle, never content.
    """
    num_partitions = effective_parallelism(cfg)

    def serialize(batch: pa.Table) -> pa.Table:
        # binary payload: the bucketed hash join rejects list columns
        sig = _minhash_matrix(batch)
        return pa.table(
            {
                "fid": batch["fid"],
                "file_id": batch["file_id"],
                "sig": pa.array([row.tobytes() for row in sig], pa.large_binary()),
            }
        )

    sig_cols = sigs.map_batches(serialize, batch_format="pyarrow")

    from duplicate_finder_ray.stages.join import bucketed_inner_join
    from duplicate_finder_ray.stages.util import rename_cols

    joined = rename_cols(
        bucketed_inner_join(pairs, sig_cols, "a", "fid", num_partitions),
        {"sig": "minhash_a", "file_id": "fa"},
    )
    joined = rename_cols(
        bucketed_inner_join(joined, sig_cols, "b", "fid", num_partitions),
        {"sig": "minhash_b", "file_id": "fb"},
    )

    threshold = cfg.jaccard_threshold

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return VERIFIED_SCHEMA.empty_table()
        sa = np.stack(
            [np.frombuffer(x, np.uint64) for x in batch.column("minhash_a").to_pylist()]
        )
        sb = np.stack(
            [np.frombuffer(x, np.uint64) for x in batch.column("minhash_b").to_pylist()]
        )
        est = (sa == sb).mean(axis=1)
        fa = batch.column("fa").to_numpy(zero_copy_only=False)
        fb = batch.column("fb").to_numpy(zero_copy_only=False)
        swap = fa > fb
        out = pa.table(
            {
                "a": pa.array(np.where(swap, fb, fa), pa.string()),
                "b": pa.array(np.where(swap, fa, fb), pa.string()),
                "n_bands": pa.compute.cast(batch["n_bands"], pa.int64()),
                "jaccard": pa.array(est, pa.float64()),
                "n_inter": pa.array(np.full(len(est), -1, dtype=np.int64)),
                "n_union": pa.array(np.full(len(est), -1, dtype=np.int64)),
            }
        )
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    return joined.map_batches(score, batch_format="pyarrow")


def _matrix_from(batch: pa.Table, col_name: str) -> np.ndarray:
    col = batch.column(col_name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    return flat.reshape(len(batch), -1)


class ShingleSetStage:
    """Actor-pool stage: (file_id, content) → (file_id, shingles
    list<uint64>) for exact-Jaccard verification of candidate endpoints
    only (never run over the full corpus)."""

    def __init__(self, cfg: PipelineConfig) -> None:
        self.shingler = Shingler(
            k=cfg.shingle_k, mode=cfg.shingle_mode, token_hash=cfg.token_hash
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch.column("content").to_pylist()
        arrays = [
            self.shingler.shingle_hashes(t if t is not None else "")
            for t in contents
        ]
        # serialized as binary (uint64 little-endian bytes): pyarrow's
        # hash join rejects list-typed payload columns
        shingle_col = pa.array([a.tobytes() for a in arrays], pa.large_binary())
        ids = batch.column("file_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "fid": pa.array(fid_of(ids), pa.uint64()),
                "file_id": batch["file_id"],
                "shingles": shingle_col,
            }
        )


def prestart_verify_split(
    code_with_id: ray.data.Dataset, cfg: PipelineConfig
) -> dict:
    """Launch the exact-verify shard SPLIT (payload partition of the
    materialized signature table by ``fid % n_shards``) NOW, so it
    overlaps candidate generation instead of serializing after it
    (round-4 VERDICT item 2 — the split wave was a measured ~1.8 s
    critical-path term at 32 CPUs on the 2.4 M scaling corpus).

    The prestarted split is UNFILTERED: pair endpoints are unknown
    until candidates finish, so the full signature payload is
    partitioned and the CSR build (which runs after endpoints exist)
    applies the endpoint semi-join instead — verify's built-CSR memory
    is unchanged; only the transient split sub-blocks cover the whole
    corpus. Returns an opaque handle for ``verify_pairs_exact``'s
    ``prestarted=`` parameter; the handle is only honored when the
    sharded path is actually taken and shard counts match."""
    n_shards = max(4, effective_parallelism(cfg))
    sets_blocks = code_with_id.materialize().to_arrow_refs()

    @ray.remote
    def split_plain(block: pa.Table):
        cols = ["fid", "file_id", "shingles"]
        if "fid" not in block.column_names or len(block) == 0:
            empty = pa.table(
                {
                    "fid": pa.array([], pa.uint64()),
                    "file_id": pa.array([], pa.string()),
                    "shingles": pa.array([], pa.large_binary()),
                }
            )
            parts = [empty] * n_shards
        else:
            block = block.select(cols)
            fid = block.column("fid").to_numpy().astype(np.uint64)
            shard = (fid % np.uint64(n_shards)).astype(np.int64)
            parts = [
                block.filter(pa.array(shard == s)) for s in range(n_shards)
            ]
        return parts[0] if n_shards == 1 else tuple(parts)

    split_refs = [
        split_plain.options(num_returns=n_shards).remote(r)
        for r in sets_blocks
    ]
    if n_shards == 1:
        split_refs = [[r] for r in split_refs]
    return {"n_shards": n_shards, "split_refs": split_refs}


def verify_pairs_exact(
    pairs: ray.data.Dataset,
    code_with_id: ray.data.Dataset,
    cfg: PipelineConfig,
    prestarted: dict | None = None,
) -> ray.data.Dataset:
    """Exact-Jaccard verification: keep pairs with true shingle Jaccard
    ≥ τ. Pairs arrive as uint64 fids; output is (a, b, n_bands,
    jaccard) with STRING file_ids (a < b lexicographically). Scale
    shape:

    1. collect the distinct pair endpoints (uint64, small vs corpus)
       in one remote task and broadcast the sorted array;
    2. semi-join: filter the signature table to endpoint rows inside
       map_batches (searchsorted probe — content does NOT shuffle);
    3. shingle sets come from the signature pass (or an actor-pool
       re-shingle when absent), CSR-indexed by fid;
    4. vectorized-per-pair exact Jaccard, filter ≥ τ, translate fids
       back to strings via the file_ids the CSR already carries.

    When the endpoint set is small (≤ ``broadcast_limit``) the CSR is
    broadcast and pairs are scored in a single map_batches — no joins
    at all (ray_guide: broadcast the small side). The bucketed-join
    path remains the 10^12-scale shape.
    """
    import pyarrow.compute as pc

    # distinct pair endpoints, computed in ONE remote task over the pair
    # blocks (driver reads back only the count — the sorted uint64 array
    # stays in the object store for the probe tasks)
    pairs_mat = pairs.materialize()

    @ray.remote(num_returns=2)
    def collect_endpoints(*blocks: pa.Table) -> tuple:
        # empty blocks can surface with a bare zero-column schema
        blocks = tuple(b for b in blocks if "a" in b.column_names and len(b))
        if not blocks:
            return 0, np.empty(0, dtype=np.uint64)
        tbl = pa.concat_tables([b.select(["a", "b"]) for b in blocks])
        uniq = np.unique(
            np.concatenate(
                [
                    tbl.column("a").to_numpy().astype(np.uint64),
                    tbl.column("b").to_numpy().astype(np.uint64),
                ]
            )
        )
        return len(uniq), uniq

    count_ref, endpoints_ref = collect_endpoints.remote(*pairs_mat.to_arrow_refs())
    n_endpoints = int(ray.get(count_ref))
    pairs = pairs_mat
    broadcast_limit = cfg.broadcast_verify_limit

    def probe(batch: pa.Table) -> pa.Table:
        # membership via searchsorted against the broadcast SORTED
        # uint64 array — integer compares, no object-array deserialize
        ep = ray.get(endpoints_ref)
        ids = batch.column("fid").to_numpy().astype(np.uint64)
        pos = np.searchsorted(ep, ids)
        pos[pos >= len(ep)] = 0
        keep = (ep[pos] == ids) if len(ep) else np.zeros(len(ids), dtype=bool)
        return batch.filter(pa.array(keep))

    source_cols = code_with_id.schema().names
    has_shingles = "shingles" in source_cols
    if has_shingles:
        # the signature pass already carried the shingle sets — filter to
        # the endpoints; content is never re-read or re-shingled
        shingle_sets = code_with_id.select_columns(
            ["fid", "file_id", "shingles"]
        ).map_batches(probe, batch_format="pyarrow")
    else:
        def add_fid(batch: pa.Table) -> pa.Table:
            ids = batch.column("file_id").to_numpy(zero_copy_only=False)
            return batch.append_column("fid", pa.array(fid_of(ids), pa.uint64()))

        cand = (
            code_with_id.select_columns(["file_id", "content"])
            .map_batches(add_fid, batch_format="pyarrow")
            .map_batches(probe, batch_format="pyarrow")
        )
        shingle_sets = cand.map_batches(
            ShingleSetStage,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=cfg.derive_batch_size,
            concurrency=pool_size(cfg),
            num_cpus=1,
        )

    threshold = cfg.jaccard_threshold

    if n_endpoints <= broadcast_limit:
        # --- broadcast path: ONE fid-keyed CSR in the object store ---
        # (radix-sortable uint64 keys, a sort permutation, and the
        # shingle/name payloads as ARROW columns — no payload sort, no
        # numpy copy; see _build_csr_task). The driver never touches the
        # heavy data; every scoring task reads the CSR zero-copy from
        # plasma. Right up to the per-node memory budget; beyond it the
        # sharded path below keeps the same kernel.
        sets_blocks = shingle_sets.materialize()
        refs = sets_blocks.to_arrow_refs()
        sets_ref = (
            _build_csr_task.remote(None, 0, None, *refs)
            if refs
            else ray.put(_EMPTY_CSR)
        )

        def score_broadcast(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return VERIFIED_SCHEMA.empty_table()
            csr = ray.get(sets_ref)
            return _score_pairs_two_csr(batch, csr, csr, threshold)

        return pairs.map_batches(score_broadcast, batch_format="pyarrow")

    # --- sharded-CSR path (the 10^12-file scale shape) ---
    # The endpoint shingle table is hash-partitioned ONCE by
    # ``fid % n_shards`` (the only time payload crosses the exchange);
    # each shard becomes its own CSR object built by a parallel remote
    # task. Pairs — 20-byte rows — are then grouped by the
    # (shard(a), shard(b)) pair so every scoring task zero-copy reads
    # exactly TWO shard objects from plasma. Per-task memory is
    # O(corpus/n_shards), the pair shuffle is payload-free, and on a
    # multi-node cluster a shard is fetched only by the nodes that probe
    # it. (The previous fallback hash-joined the shingle column onto
    # both pair endpoints: the a-side payload rode the b-side shuffle
    # and the join merge serialized behind object-store backpressure —
    # measured unusable at 2.4M docs.)
    n_shards = max(4, effective_parallelism(cfg))

    # MAP-SIDE SPLIT EXCHANGE, not a groupby: Ray Data's sort-based
    # groupby("shard") physically sorts the multi-GB shingle payload
    # through a sample/boundary barrier — measured 77 s serial-ish at
    # 2.4 M docs (vs ~2 s for everything else in this stage) and it was
    # THE flat term pinning the 8→32-CPU scaling of the whole pipeline.
    # Instead each endpoint block splits itself into n_shards sub-tables
    # in parallel (every payload byte is copied exactly once, map-side),
    # and each shard's CSR build consumes its own sub-objects — no sort,
    # no sampling, and on a multi-node cluster each byte crosses the
    # network once.
    #
    # When the source already carries the shingle sets, the endpoint
    # PROBE is fused into the split task itself (one pass: filter +
    # shard in the same block visit) — the previous separate probe
    # map_batches + materialize re-wrote the endpoint slice of the
    # multi-GB signature table through the object store once more for
    # no structural gain (round-3 fixed-term trim on the verify stage).
    prestarted_used = (
        prestarted is not None
        and has_shingles
        and prestarted.get("n_shards") == max(4, effective_parallelism(cfg))
    )
    if prestarted_used:
        # split wave already ran, overlapped under candidate
        # generation; builds below apply the endpoint filter instead
        sets_blocks = None
        fuse_probe = False
    elif has_shingles:
        # callers pass the already-materialized signature table; the
        # column projection happens inside the split task (zero-copy
        # Arrow select), so NO new materialization of the payload at all
        sets_blocks = code_with_id.materialize().to_arrow_refs()
        fuse_probe = True
    else:
        sets_blocks = shingle_sets.materialize().to_arrow_refs()
        fuse_probe = False

    @ray.remote
    def split_block(block: pa.Table):
        cols = ["fid", "file_id", "shingles"]
        if "fid" not in block.column_names or len(block) == 0:
            empty = pa.table(
                {
                    "fid": pa.array([], pa.uint64()),
                    "file_id": pa.array([], pa.string()),
                    "shingles": pa.array([], pa.large_binary()),
                }
            )
            parts = [empty] * n_shards
        else:
            block = block.select(cols)
            if fuse_probe:
                block = probe(block)
            fid = block.column("fid").to_numpy().astype(np.uint64)
            shard = (fid % np.uint64(n_shards)).astype(np.int64)
            parts = [
                block.filter(pa.array(shard == s)) for s in range(n_shards)
            ]
        return parts[0] if n_shards == 1 else tuple(parts)

    if prestarted_used:
        split_refs = prestarted["split_refs"]
    else:
        split_refs = [
            split_block.options(num_returns=n_shards).remote(r)
            for r in sets_blocks
        ]
        if n_shards == 1:
            split_refs = [[r] for r in split_refs]
    empty_ref = ray.put(_EMPTY_CSR)
    # fused-probe split already endpoint-filtered; prestarted split did
    # not (endpoints were unknown at split time), so its builds filter
    build_ep = endpoints_ref if prestarted_used else None
    shard_refs = {
        s: _build_csr_task.remote(
            s, n_shards, build_ep, *[row[s] for row in split_refs]
        )
        for s in range(n_shards)
    }

    # Route pairs to scoring tasks by the A-SIDE shard via the
    # barrier-free hash exchange (one reduce task per sa); each reduce
    # sub-groups its rows by the b-side shard and scores group-at-a-time
    # against (csr_a, csr_b). Ray Data's sort-based groupby("spair")
    # previously paid a sample barrier + a full sort of the slim pair
    # table for an order nothing needs — the same fixed term the band
    # and members exchanges already eliminated. Zero-copy plasma reads
    # mean touching up to n_shards CSR objects per task costs mmaps,
    # not copies.
    from duplicate_finder_ray.stages.exchange import hash_exchange

    def sa_part(tbl: pa.Table, n: int) -> np.ndarray:
        return (
            tbl.column("a").to_numpy().astype(np.uint64) % np.uint64(n)
        ).astype(np.int64)

    def score_reduce(sa: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return VERIFIED_SCHEMA.empty_table()
        a = tbl.column("a").to_numpy().astype(np.uint64)
        b = tbl.column("b").to_numpy().astype(np.uint64)
        nb = tbl.column("n_bands").to_numpy().astype(np.int64)
        sb_all = (b % np.uint64(n_shards)).astype(np.int64)
        csr_a = ray.get(shard_refs.get(sa, empty_ref))
        outs = []
        for sb in np.unique(sb_all):
            sel = sb_all == sb
            ref_b = shard_refs.get(int(sb), empty_ref)
            csr_b = (
                csr_a if int(sb) == sa else ray.get(ref_b)
            )
            batch = pa.table(
                {
                    "a": pa.array(a[sel], pa.uint64()),
                    "b": pa.array(b[sel], pa.uint64()),
                    "n_bands": pa.array(nb[sel], pa.int64()),
                }
            )
            out = _score_pairs_two_csr(batch, csr_a, csr_b, threshold)
            if len(out):
                outs.append(out)
        if not outs:
            return VERIFIED_SCHEMA.empty_table()
        return pa.concat_tables(outs)

    return hash_exchange(
        pairs.select_columns(["a", "b", "n_bands"]),
        sa_part,
        n_shards,
        score_reduce,
        VERIFIED_SCHEMA.empty_table(),
    )


_EMPTY_CSR = (
    np.empty(0, dtype=np.uint64),      # sorted fids
    np.empty(0, dtype=np.int64),       # sort permutation -> row index
    None,                              # shingle sets (arrow, row order)
    None,                              # file_ids (arrow, row order)
)


def _csr_views(col: pa.Array) -> tuple:
    """(byte offsets / 8, flat uint64 view) over an arrow large_binary
    column's buffers — ZERO copies; the data stays in the plasma-mapped
    buffer."""
    if col is None or len(col) == 0:
        return np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.uint64)
    arrow_offsets = np.frombuffer(
        col.buffers()[1], dtype=np.int64, count=len(col) + 1,
        offset=col.offset * 8,
    )
    data_buf = col.buffers()[2]
    flat = (
        np.frombuffer(data_buf, dtype=np.uint64)[
            arrow_offsets[0] // 8 : arrow_offsets[-1] // 8
        ]
        if data_buf is not None
        else np.empty(0, dtype=np.uint64)
    )
    return ((arrow_offsets - arrow_offsets[0]) // 8).astype(np.int64), flat


@ray.remote
def _build_csr_task(
    shard, n_shards: int, endpoints, *blocks: pa.Table
) -> tuple:
    """fid-keyed CSR over (a shard of) the endpoint shingle table.

    NO payload sort and NO numpy copy of the values: only the 8-byte
    keys are argsorted; an indirection array maps sorted-key position ->
    original row, and the shingle/name payloads travel as ARROW columns
    (pickle5 out-of-band buffers — one plasma write, zero-copy reads per
    task). A table sort_by here physically rearranges the
    multi-hundred-MB payload, and a numpy .copy() of it pays this
    sandbox's ~80 MB/s fresh-page fault cost — both measured at 10-45 s
    serial with every scoring task blocked behind.

    ``shard``: None builds over all rows (broadcast path); an int keeps
    only rows with ``fid % n_shards == shard`` (sharded path — blocks
    arrive group-aligned, so the filter is usually a no-op).
    ``endpoints``: optional sorted uint64 array — rows whose fid is not
    in it are dropped BEFORE the argsort (the prestarted-split path
    partitions the full signature payload because endpoints are
    unknown at split time; this filter keeps the built CSR
    endpoint-sized either way)."""
    blocks = tuple(b for b in blocks if "fid" in b.column_names and len(b))
    if not blocks:
        return _EMPTY_CSR
    tbl = pa.concat_tables(
        [b.select(["fid", "file_id", "shingles"]) for b in blocks]
    )
    fids = tbl.column("fid").to_numpy().astype(np.uint64)
    if endpoints is not None and len(fids):
        if len(endpoints):
            pos = np.minimum(
                np.searchsorted(endpoints, fids), len(endpoints) - 1
            )
            keep = endpoints[pos] == fids
        else:
            keep = np.zeros(len(fids), dtype=bool)
        if not keep.all():
            tbl = tbl.filter(pa.array(keep))
            fids = fids[keep]
    if shard is not None:
        mask = (fids % np.uint64(n_shards)).astype(np.int64) == shard
        if not mask.all():
            tbl = tbl.filter(pa.array(mask))
            fids = fids[mask]
    order = np.argsort(fids, kind="stable").astype(np.int64)
    col = tbl.column("shingles").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.large_binary())
    names = tbl.column("file_id").combine_chunks()
    if isinstance(names, pa.ChunkedArray):
        names = names.chunk(0) if names.num_chunks else pa.array([], pa.string())
    return fids[order], order, col, names


def _csr_rows(csr: tuple, probe: np.ndarray) -> np.ndarray:
    """Row indices (-1 = missing) of ``probe`` keys in a CSR."""
    keys, order = csr[0], csr[1]
    nk = len(keys)
    if nk == 0:
        return np.full(len(probe), -1, dtype=np.int64)
    pos = np.minimum(np.searchsorted(keys, probe), nk - 1)
    return np.where(keys[pos] == probe, order[pos], -1)


def _score_pairs_two_csr(
    batch: pa.Table, csr_a: tuple, csr_b: tuple, threshold: float
) -> pa.Table:
    """Exact-Jaccard scoring kernel shared by the broadcast and sharded
    verify paths: a-side rows resolve against ``csr_a``, b-side against
    ``csr_b`` (the same object on the broadcast path). Emits the
    VERIFIED_SCHEMA with string file_ids, a < b."""
    import pyarrow.compute as pc

    row_a = _csr_rows(csr_a, batch.column("a").to_numpy().astype(np.uint64))
    row_b = _csr_rows(csr_b, batch.column("b").to_numpy().astype(np.uint64))
    offs_a, flat_a = _csr_views(csr_a[2])
    offs_b, flat_b = _csr_views(csr_b[2])
    jac = np.empty(len(batch), dtype=np.float64)
    n_inter = np.zeros(len(batch), dtype=np.int64)
    n_union = np.zeros(len(batch), dtype=np.int64)
    for i in range(len(batch)):
        ra, rb = row_a[i], row_b[i]
        if ra < 0 or rb < 0:
            jac[i] = 0.0  # unresolvable endpoint can never verify
            continue
        xa = flat_a[offs_a[ra] : offs_a[ra + 1]]
        xb = flat_b[offs_b[rb] : offs_b[rb + 1]]
        inter = len(np.intersect1d(xa, xb, assume_unique=True))
        union = len(xa) + len(xb) - inter
        n_inter[i], n_union[i] = inter, union
        jac[i] = 1.0 if union == 0 else inter / union
    keep = jac >= threshold
    if not keep.any():
        return VERIFIED_SCHEMA.empty_table()
    names_a, names_b = csr_a[3], csr_b[3]
    sa = names_a.take(
        pa.array(np.maximum(row_a[keep], 0), pa.int64())
    ).to_numpy(zero_copy_only=False)
    sb = names_b.take(
        pa.array(np.maximum(row_b[keep], 0), pa.int64())
    ).to_numpy(zero_copy_only=False)
    swap = sa > sb
    return pa.table(
        {
            "a": pa.array(np.where(swap, sb, sa), pa.string()),
            "b": pa.array(np.where(swap, sa, sb), pa.string()),
            "n_bands": pc.cast(
                batch.column("n_bands").filter(pa.array(keep)), pa.int64()
            ),
            "jaccard": pa.array(jac[keep], pa.float64()),
            "n_inter": pa.array(n_inter[keep]),
            "n_union": pa.array(n_union[keep]),
        }
    )


def simhash_candidate_pairs(
    sigs: ray.data.Dataset, cfg: PipelineConfig, max_hamming: int = 3
) -> ray.data.Dataset:
    """SimHash near-dup: block the 64-bit fingerprint into
    ``max_hamming + 1`` bit-blocks (pigeonhole: any pair within the
    Hamming radius shares ≥1 exact block), co-locate by block value,
    verify exact Hamming ≤ radius. Same skew cap as LSH.

    Both waves ride the barrier-free hash exchange
    (stages/exchange.py), mirroring the MinHash band exchange: bucket
    co-location keyed on the mixed (band, block-value) key with a
    vectorized per-PARTITION bucketing kernel (run-lengths over the
    sorted frame, pair emission batched per distinct capped size), then
    a cross-band pair dedupe keyed on hash(a, b) — no sort-based
    groupby, no Python call per bucket (round-2 VERDICT item)."""
    num_blocks = max_hamming + 1
    cap = cfg.band_bucket_cap
    budget = cfg.band_pair_budget
    _EMPTY_OUT = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("hamming", pa.int64())]
    ).empty_table()

    def explode(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.greater(batch["n_shingles"], 0))
        if len(batch) == 0:
            return pa.table(
                {
                    "bkey": pa.array([], pa.uint64()),
                    "file_id": pa.array([], pa.string()),
                    "simhash": pa.array([], pa.uint64()),
                }
            )
        fps = batch.column("simhash").to_numpy().astype(np.uint64)
        keys = simhash_band_keys(fps, num_blocks)  # (n, num_blocks)
        n = len(batch)
        # fold the band index into one uint64 key (same trick as the
        # MinHash band_hash), then mix for partition balance — the raw
        # bit-slices are low-entropy
        band_ids = np.tile(
            np.arange(num_blocks, dtype=np.uint64), n
        )
        with np.errstate(over="ignore"):
            folded = keys.reshape(-1) * np.uint64(num_blocks) + band_ids
        bkey = pd.util.hash_array(folded)
        take = pa.array(np.repeat(np.arange(n), num_blocks))
        return pa.table(
            {
                "bkey": pa.array(bkey, pa.uint64()),
                "file_id": batch.column("file_id").take(take),
                "simhash": batch.column("simhash").take(take),
            }
        )

    def bkey_part(tbl: pa.Table, n: int) -> np.ndarray:
        return (
            tbl.column("bkey").to_numpy().astype(np.uint64) % np.uint64(n)
        ).astype(np.int64)

    def emit_partition(p: int, tbl: pa.Table) -> pa.Table:
        # vectorized bucketing across ALL of the partition's buckets:
        # run-lengths over the sorted (bkey, file_id) frame, triu pair
        # emission batched per DISTINCT capped bucket size
        part = tbl.to_pandas()
        part = part[part.duplicated(["bkey"], keep=False)]
        if len(part) == 0:
            return _EMPTY_OUT
        part = part.sort_values(["bkey", "file_id"], kind="mergesort")
        ids = part["file_id"].to_numpy()
        fps = part["simhash"].to_numpy().astype(np.uint64)
        sizes = part.groupby(["bkey"], sort=False).size().to_numpy()
        starts = np.zeros(len(sizes), dtype=np.int64)
        np.cumsum(sizes[:-1], out=starts[1:])
        eff_cap = (
            derive_bucket_cap(sizes, budget) if cap is None else cap
        )
        warn_bucket_overflow(sizes, eff_cap, kind="SimHash")
        capped = np.minimum(sizes, eff_cap)
        out_a, out_b, out_h = [], [], []
        for m in np.unique(capped):
            if m < 2:
                continue
            sel = capped == m
            st = starts[sel]
            ia, ib = np.triu_indices(int(m), k=1)
            pos_a = (st[:, None] + ia[None, :]).ravel()
            pos_b = (st[:, None] + ib[None, :]).ravel()
            x = np.bitwise_xor(fps[pos_a], fps[pos_b])
            ham = np.unpackbits(
                x.view(np.uint8).reshape(len(x), 8), axis=1
            ).sum(axis=1)
            keep = ham <= max_hamming
            out_a.append(ids[pos_a[keep]])
            out_b.append(ids[pos_b[keep]])
            out_h.append(ham[keep].astype(np.int64))
        if not out_a:
            return _EMPTY_OUT
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), pa.string()),
                "b": pa.array(np.concatenate(out_b), pa.string()),
                "hamming": pa.array(np.concatenate(out_h), pa.int64()),
            }
        )

    def pair_part(tbl: pa.Table, n: int) -> np.ndarray:
        # key on the FULL (a, b) pair — keying on a alone would funnel a
        # hub file's pairs into one partition
        ha = stable_hash_array(
            tbl.column("a").to_numpy(zero_copy_only=False).astype(object)
        )
        hb = stable_hash_array(
            tbl.column("b").to_numpy(zero_copy_only=False).astype(object)
        )
        with np.errstate(over="ignore"):
            h = ha * np.uint64(0x9E3779B97F4A7C15) ^ hb
        return (h % np.uint64(n)).astype(np.int64)

    def dedupe_reduce(p: int, tbl: pa.Table) -> pa.Table:
        agg = (
            tbl.to_pandas()
            .groupby(["a", "b"], sort=False)["hamming"]
            .min()
            .reset_index()
        )
        return pa.table(
            {
                "a": pa.array(agg["a"].to_numpy(), pa.string()),
                "b": pa.array(agg["b"].to_numpy(), pa.string()),
                "hamming": pa.array(
                    agg["hamming"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    try:
        n_parts = max(4, int(ray.cluster_resources().get("CPU", 8))) * 2
    except Exception:
        n_parts = 16
    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    pairs = hash_exchange(exploded, bkey_part, n_parts, emit_partition, _EMPTY_OUT)
    return hash_exchange(pairs, pair_part, n_parts, dedupe_reduce, _EMPTY_OUT)


# ---------------------------------------------------------------------------
# n-gram Jaccard brute force (oracle-checkable baseline; LSH is the scale
# path). ASCII tokenization so the DuckDB SQL twin matches exactly.
# ---------------------------------------------------------------------------

_ASCII_TOKEN_RE = None  # compiled lazily (keeps module import cheap)


def ascii_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Deduped uint64 hashes of the k-token shingles of ``text`` under
    ASCII ``[A-Za-z0-9_]+`` tokenization — the tokenizer the DuckDB
    oracle can reproduce (RE2 class, identical on both engines). Shingle
    identity is the blake2b-64 of tokens joined with US (0x1f), so equal
    shingle strings hash equal on every worker."""
    global _ASCII_TOKEN_RE
    if _ASCII_TOKEN_RE is None:
        import re

        _ASCII_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
    import hashlib

    tokens = _ASCII_TOKEN_RE.findall(text)
    n = len(tokens)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(n - k + 1, dtype=np.uint64)
    for i in range(n - k + 1):
        s = "\x1f".join(tokens[i : i + k])
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return np.unique(out)


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    k: int,
    threshold: float,
) -> ray.data.Dataset:
    """All unordered pairs with exact k-gram Jaccard ≥ threshold.

    Distributed brute force with an inverted-index broadcast: each doc's
    deduped shingle-hash set (small — hashes only, never text) is
    materialized, then ONE REMOTE TASK builds the global postings array
    sorted by shingle from the block refs — the driver reads back only a
    row count, never the corpus-sized array. Each batch task then scores
    its docs against the whole corpus via searchsorted + bincount —
    O(|S_a| log M) per doc, no per-pair Python work, no shuffle.
    Baseline for the LSH pipelines' recall; fine to ~10^5 docs (postings
    stay ~10^7 u64)."""

    def to_sets(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                "doc_key": pa.compute.cast(batch[id_col], pa.string()),
                "shingles": pa.array(
                    [ascii_shingle_hashes(t or "", k).tobytes() for t in texts],
                    pa.large_binary(),
                ),
            }
        )

    return shingle_set_jaccard_pairs(
        ds.map_batches(to_sets, batch_format="pyarrow"), threshold
    )


@ray.remote(num_returns=2)
def _build_postings(*blocks: pa.Table) -> tuple:
    """ONE remote task assembles the global sorted postings array
    (shingle-hash → doc index) from the set blocks; the driver reads
    back only the row count, never the corpus-sized array. Shared by
    the exact-Jaccard and containment all-pairs scorers."""
    blocks = tuple(b for b in blocks if "doc_key" in b.column_names and len(b))
    if not blocks:
        return 0, None
    tbl = pa.concat_tables(blocks).sort_by("doc_key")
    keys = tbl.column("doc_key").to_numpy(zero_copy_only=False)
    col = tbl.column("shingles").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], pa.large_binary())
    arrow_offsets = np.frombuffer(
        col.buffers()[1], dtype=np.int64, count=len(col) + 1,
        offset=col.offset * 8,
    )
    sizes = ((arrow_offsets[1:] - arrow_offsets[:-1]) // 8).astype(np.int64)
    data_buf = col.buffers()[2]
    all_sh = (
        np.frombuffer(data_buf, dtype=np.uint64)[
            arrow_offsets[0] // 8 : arrow_offsets[-1] // 8
        ]
        if data_buf is not None and sizes.sum()
        else np.empty(0, dtype=np.uint64)
    )
    all_doc = np.repeat(np.arange(len(keys), dtype=np.int64), sizes)
    order = np.argsort(all_sh, kind="stable")
    return len(keys), (keys, sizes, all_sh[order], all_doc[order])


def shingle_set_jaccard_pairs(
    sets_ds: ray.data.Dataset, threshold: float
) -> ray.data.Dataset:
    """Exact-Jaccard ALL-pairs ≥ threshold over pre-shingled docs
    ``(doc_key: string, shingles: large_binary of uint64-LE)`` — the
    brute-force truth oracle for the LSH pipelines' recall gate
    (north_rule: dup-pair recall ≥ 0.99 at identical shingle config).
    Same inverted-postings broadcast shape as ``ngram_jaccard_pairs``.
    """
    sets_ds = sets_ds.materialize()

    set_refs = sets_ds.to_arrow_refs()
    n_docs_total = 0
    if set_refs:
        count_ref, ref = _build_postings.remote(*set_refs)
        n_docs_total = int(ray.get(count_ref))
    if n_docs_total == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("a", pa.string()), ("b", pa.string()), ("jaccard", pa.float64())]
            ).empty_table()
        )

    out_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("jaccard", pa.float64())]
    )

    def score_block(batch: pa.Table) -> pa.Table:
        keys_g, sizes_g, sh_sorted, doc_sorted = ray.get(ref)
        n_docs = len(keys_g)
        a_keys: list[str] = []
        b_keys: list[str] = []
        jacs: list[float] = []
        batch_keys = batch.column("doc_key").to_pylist()
        for row_i, blob in enumerate(batch.column("shingles").to_pylist()):
            sa = np.frombuffer(blob, dtype=np.uint64)
            if len(sa) == 0:
                continue
            lo = np.searchsorted(sh_sorted, sa, side="left")
            hi = np.searchsorted(sh_sorted, sa, side="right")
            runs = hi - lo
            # gather posting doc indices for every matching occurrence
            idx = np.repeat(lo, runs) + (
                np.arange(int(runs.sum())) - np.repeat(np.cumsum(runs) - runs, runs)
            )
            inter = np.bincount(doc_sorted[idx], minlength=n_docs)
            union = len(sa) + sizes_g - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                jac = np.where(union > 0, inter / union, 0.0)
            my_key = batch_keys[row_i]
            cand = np.nonzero(jac >= threshold)[0]
            for j in cand:
                if keys_g[j] > my_key:  # unordered dedupe + drop self
                    a_keys.append(my_key)
                    b_keys.append(keys_g[j])
                    jacs.append(float(jac[j]))
        if not a_keys:
            return out_schema.empty_table()
        return pa.table(
            {
                "a": pa.array(a_keys, pa.string()),
                "b": pa.array(b_keys, pa.string()),
                "jaccard": pa.array(np.round(np.array(jacs), 6)),
            }
        )

    return sets_ds.map_batches(score_block, batch_format="pyarrow")


_CONTAIN_SCHEMA = pa.schema(
    [
        ("a", pa.string()),
        ("b", pa.string()),
        ("n_inter", pa.int64()),
        ("n_a", pa.int64()),
        ("n_b", pa.int64()),
    ]
)


def ngram_containment_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    k: int,
    threshold: float,
) -> ray.data.Dataset:
    """Asymmetric near-dup: all unordered pairs whose k-gram shingle
    CONTAINMENT ``|A ∩ B| / min(|A|, |B|)`` ≥ threshold — catches
    sub/superset documents (a file embedded in a larger one, quoted
    passages, template+payload) that symmetric Jaccard misses because
    the size imbalance dilutes the union. ASCII tokenization so the
    DuckDB twin matches exactly; emits exact integer set sizes
    (rounding-proof oracle columns). Same inverted-postings broadcast
    shape as :func:`ngram_jaccard_pairs` — a ≤10^5-doc truth baseline;
    the LSH pipelines remain the scale path."""

    def to_sets(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                "doc_key": pa.compute.cast(batch[id_col], pa.string()),
                "shingles": pa.array(
                    [ascii_shingle_hashes(t or "", k).tobytes() for t in texts],
                    pa.large_binary(),
                ),
            }
        )

    return shingle_set_containment_pairs(
        ds.map_batches(to_sets, batch_format="pyarrow"), threshold
    )


def shingle_set_containment_pairs(
    sets_ds: ray.data.Dataset, threshold: float
) -> ray.data.Dataset:
    """Containment ALL-pairs ≥ threshold over pre-shingled docs
    ``(doc_key: string, shingles: large_binary of uint64-LE)`` →
    ``(a, b, n_inter, n_a, n_b)`` with a < b. Scoring batches probe the
    one-task global postings array via searchsorted + bincount — the
    same O(|S_a| log M) per doc, no shuffle, driver never sees the
    postings."""
    sets_ds = sets_ds.materialize()

    set_refs = sets_ds.to_arrow_refs()
    n_docs_total = 0
    if set_refs:
        count_ref, ref = _build_postings.remote(*set_refs)
        n_docs_total = int(ray.get(count_ref))
    if n_docs_total == 0:
        return ray.data.from_arrow(_CONTAIN_SCHEMA.empty_table())

    def score_block(batch: pa.Table) -> pa.Table:
        keys_g, sizes_g, sh_sorted, doc_sorted = ray.get(ref)
        n_docs = len(keys_g)
        a_keys: list[str] = []
        b_keys: list[str] = []
        n_is: list[int] = []
        n_as: list[int] = []
        n_bs: list[int] = []
        batch_keys = batch.column("doc_key").to_pylist()
        for row_i, blob in enumerate(batch.column("shingles").to_pylist()):
            sa = np.frombuffer(blob, dtype=np.uint64)
            if len(sa) == 0:
                continue
            lo = np.searchsorted(sh_sorted, sa, side="left")
            hi = np.searchsorted(sh_sorted, sa, side="right")
            runs = hi - lo
            idx = np.repeat(lo, runs) + (
                np.arange(int(runs.sum())) - np.repeat(np.cumsum(runs) - runs, runs)
            )
            inter = np.bincount(doc_sorted[idx], minlength=n_docs)
            denom = np.minimum(len(sa), sizes_g)
            with np.errstate(divide="ignore", invalid="ignore"):
                cont = np.where(denom > 0, inter / denom, 0.0)
            my_key = batch_keys[row_i]
            for j in np.nonzero(cont >= threshold)[0]:
                if keys_g[j] > my_key:  # unordered dedupe + drop self
                    a_keys.append(my_key)
                    b_keys.append(keys_g[j])
                    n_is.append(int(inter[j]))
                    n_as.append(len(sa))
                    n_bs.append(int(sizes_g[j]))
        if not a_keys:
            return _CONTAIN_SCHEMA.empty_table()
        return pa.table(
            {
                "a": pa.array(a_keys, pa.string()),
                "b": pa.array(b_keys, pa.string()),
                "n_inter": pa.array(n_is, pa.int64()),
                "n_a": pa.array(n_as, pa.int64()),
                "n_b": pa.array(n_bs, pa.int64()),
            }
        )

    return sets_ds.map_batches(score_block, batch_format="pyarrow")
