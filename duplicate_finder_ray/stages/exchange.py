"""Hash exchange built on raw Ray tasks — the engine's shuffle
primitive for payload-bearing co-location.

WHY NOT ``Dataset.groupby``: Ray Data's groupby is sort-based — it
samples boundaries (a barrier), physically sorts every block, and
range-exchanges the sorted runs. For key-LOOKUP co-location (hash
buckets, shards) the sort order is wasted work, and the sample/boundary
barrier is CPU-count-independent serial wall: replacing it on the
exact-verify shard exchange measured 77 s → <2 s at 2.4 M docs, and the
same shape applies to the LSH band exchange. This module is the
documented "drop to raw Ray tasks where the Dataset API can't express
the semantics" case: a map-side split + per-partition reduce in which
every payload byte is copied exactly once and crosses a (real
cluster's) network exactly once, with zero barriers between the split
and reduce waves — Ray schedules reduces as their inputs appear.

Scale shape: blocks × n_parts small objects (sub-tables) in the object
store; each reduce task zero-copy reads its ``blocks`` inputs. Keep
``n_parts`` a small multiple of cluster parallelism.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray
import ray.data


def hash_exchange(
    source: ray.data.Dataset,
    part_of: Callable[[pa.Table, int], np.ndarray],
    n_parts: int,
    reduce_fn: Callable[[int, pa.Table], pa.Table],
    empty: pa.Table,
    premap: Callable[[pa.Table], pa.Table] | None = None,
) -> ray.data.Dataset:
    """Partition ``source`` by ``part_of(table, n_parts)`` (an int
    array in [0, n_parts)) and apply ``reduce_fn(part_idx, rows)`` to
    each partition's concatenated rows. Returns a Dataset of the reduce
    outputs (one block per partition). ``empty`` supplies the output
    schema for empty partitions.

    ``premap``: optional per-block transform applied INSIDE the split
    task before partitioning — fuses a row-expanding map (e.g. LSH band
    explosion) into the exchange so its output never materializes as an
    intermediate dataset: the expanded rows are born and partitioned in
    the same task, saving one full object-store write + read of the
    expanded table. ``part_of`` sees the premapped rows. An empty
    premap output must still carry the premapped schema."""
    blocks = source.materialize().to_arrow_refs()
    if not blocks:
        return ray.data.from_arrow(empty)

    @ray.remote
    def split(block: pa.Table):
        if premap is not None:
            block = premap(block)
        if len(block) == 0 or block.num_columns == 0:
            parts = [block.slice(0, 0)] * n_parts
        else:
            pid = np.asarray(part_of(block, n_parts))
            # enforce the [0, n_parts) contract loudly: block.filter
            # would silently DROP rows a buggy partitioner sends out of
            # range, corrupting results with no error
            if len(pid) != len(block):
                raise ValueError(
                    f"partitioner returned {len(pid)} ids for "
                    f"{len(block)} rows"
                )
            lo, hi = int(pid.min()), int(pid.max())
            if lo < 0 or hi >= n_parts:
                raise ValueError(
                    f"partitioner produced ids outside [0, {n_parts}): "
                    f"min={lo} max={hi}"
                )
            parts = [block.filter(pa.array(pid == p)) for p in range(n_parts)]
        return parts[0] if n_parts == 1 else tuple(parts)

    split_refs = [
        split.options(num_returns=n_parts).remote(b) for b in blocks
    ]
    if n_parts == 1:
        split_refs = [[r] for r in split_refs]

    @ray.remote
    def reduce_part(p: int, *subs: pa.Table) -> pa.Table:
        subs = tuple(s for s in subs if len(s) and s.num_columns)
        if not subs:
            return empty
        out = reduce_fn(p, pa.concat_tables(subs).combine_chunks())
        return out if len(out) else empty

    out_refs = [
        reduce_part.remote(p, *[row[p] for row in split_refs])
        for p in range(n_parts)
    ]
    return ray.data.from_arrow_refs(out_refs)
