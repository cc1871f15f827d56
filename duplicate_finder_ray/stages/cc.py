"""Distributed connected components via iterative hash-to-min label
propagation (north_rule's "distributed union-find ... driven by
groupby-aggregate shuffles").

Algorithm (public: "hash-to-min", Rastogi et al. 2013 "Finding
Connected Components in MapReduce"; load-balancing concerns per BTS,
ICDE 2024 — see PAPERS.md):

    label(v) ← v
    repeat:
        every edge (u,v) proposes label(u) to v and label(v) to u
        label(v) ← min(label(v), proposals)
    until no label changes

Each round is: one bucketed hash join (labels onto edge sources) + one
bucketed groupby-min — all expressed on Ray's sort-based groupby path
(see stages/join.py for why the built-in hash-join/aggregate operators
are avoided here). Convergence in O(diameter) rounds; near-dup
components are star-like (diameter ≤ ~4), so 3-5 rounds in practice.
The per-round label table is materialized (it is small: candidate nodes
only — nodes untouched by any pair are singletons by definition and
never enter the loop).

The driver only orchestrates rounds and reads one scalar (changed
count) per round; labels and edges stay distributed.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.stages.join import bucketed_inner_join, grouped_min
from duplicate_finder_ray.stages.util import rename_cols

_LABELS_SCHEMA = pa.schema([("file_id", pa.string()), ("component", pa.string())])


def connected_components(
    pairs: ray.data.Dataset, cfg: PipelineConfig
) -> ray.data.Dataset:
    """Label every node in the pair graph with its component id (the
    lexicographically smallest file_id in the component — consistent
    with the engine-wide keep-first rule).

    pairs: Dataset with string columns (a, b). Returns (file_id,
    component).
    """
    from duplicate_finder_ray.stages.neardup import effective_parallelism

    num_buckets = effective_parallelism(cfg) * 2
    edges = pairs.select_columns(["a", "b"]).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(_LABELS_SCHEMA.empty_table())

    # symmetric edge list: src -> dst both ways
    def symmetrize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [c for col in (batch["a"], batch["b"]) for c in _chunks(col)]
                ),
                "dst": pa.concat_arrays(
                    [c for col in (batch["b"], batch["a"]) for c in _chunks(col)]
                ),
            }
        )

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    # initial labels: label(v) = min(v, min neighbor) — one round for free
    init = sym.map_batches(
        lambda t: pa.table(
            {
                "file_id": t["src"],
                "candidate": pc.min_element_wise(t["src"], t["dst"]),
            }
        ),
        batch_format="pyarrow",
    )
    labels = grouped_min(init, "file_id", "candidate", "component", num_buckets)
    labels = labels.materialize()

    prev_sum = _label_checksum(labels)
    for _ in range(cfg.cc_max_rounds):
        # propose: neighbor labels travel along edges (join on src)
        proposals = rename_cols(
            bucketed_inner_join(
                sym, labels, "src", "file_id", num_buckets
            ).select_columns(["dst", "component"]),
            {"dst": "file_id", "component": "candidate"},
        )
        own = rename_cols(labels, {"component": "candidate"})
        new_labels = grouped_min(
            proposals.union(own), "file_id", "candidate", "component", num_buckets
        ).materialize()  # feeds BOTH sides of the jump join — never recompute
        # pointer jumping: component ← label(component). Every component
        # id is itself a node of the graph (a min file_id), so the self-
        # join is total. Halves the remaining path length each round ⇒
        # O(log diameter) rounds instead of O(diameter).
        jumped = bucketed_inner_join(
            rename_cols(new_labels, {"component": "mid"}),
            rename_cols(new_labels, {"file_id": "mid"}),
            "mid",
            "mid",
            num_buckets,
        ).select_columns(["file_id", "component"])
        # CRITICAL: union+sort emit O(input blocks) output blocks, which
        # compounds ~4× per iteration — without this repartition the
        # block count (and per-round wall time) grows EXPONENTIALLY
        labels = jumped.repartition(num_buckets).materialize()
        # convergence: order/partition-insensitive checksum — one cheap
        # map + driver sum, no join shuffle (the driver reads one scalar)
        cur_sum = _label_checksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def _chunks(col: pa.ChunkedArray | pa.Array) -> list[pa.Array]:
    if isinstance(col, pa.ChunkedArray):
        return col.chunks
    return [col]


def _label_checksum(labels: ray.data.Dataset) -> int:
    """Order- and partition-insensitive checksum of the label table
    (sum of crc32(file_id→component) per row). Equal checksums across
    rounds ⇒ fixpoint (collision odds ~2^-60 at any realistic size)."""
    from zlib import crc32

    def fold(batch: pa.Table) -> pa.Table:
        fids = batch.column("file_id").to_pylist()
        comps = batch.column("component").to_pylist()
        acc = 0
        for f, c in zip(fids, comps):
            acc += crc32(f"{f}\x00{c}".encode())
        return pa.table({"s": pa.array([acc], pa.int64())})

    parts = labels.map_batches(fold, batch_format="pyarrow").to_pandas()
    return int(parts["s"].sum())


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
