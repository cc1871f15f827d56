"""Shuffle-planning diagnostics.

The north-star failure mode at corpus scale is key skew: one mega-repo
or hot shingle turning a hash partition into a straggler. The engine
handles skew *inside* its operators (LSH hot-bucket caps, IVF hot-cell
splitting, the repo-overlap pair cap); this module gives the USER the
observability half — measure how a candidate partitioning key actually
distributes before launching the expensive job, with a
cross-engine-replayable partitioner (md5 prefix, the same lattice as
``deterministic_sample``/``split_assign``) so the report is
oracle-checkable and identical on any engine."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from duplicate_finder_ray.stages.exchange import hash_exchange
from duplicate_finder_ray.stages.relational import _md5_prefix_u64


def key_skew_report(
    ds: ray.data.Dataset,
    key_col: str,
    n_parts: int = 32,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Simulated-partitioning skew report: assign every row to
    ``partition_id = int(md5(key)[:8 hex], 16) % n_parts`` (replayable
    in any engine) and report, per partition: row count, distinct-key
    count, and the heaviest key with its row count (ties to the
    lexicographically-first key). A balanced key shows n_rows ≈
    total/n_parts everywhere; a mega-repo shows up as one partition's
    ``top_key_n`` ≈ its ``n_rows``.

    Shape: per-batch (pid, key, n) count partials — the combiner keeps
    the shuffle at (keys × blocks), never row count — then ONE
    pid-keyed exchange whose reduce merges partials and emits exactly
    one slim row per partition id. The md5-per-distinct-key loop runs
    over batch-deduped keys via the C-level memoryview kernel shared
    with ``deterministic_sample``."""
    if n_parts <= 0:
        raise ValueError("n_parts must be positive")
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")

    out_schema = pa.schema(
        [
            ("partition_id", pa.int64()),
            ("n_rows", pa.int64()),
            ("n_keys", pa.int64()),
            ("top_key", pa.string()),
            ("top_key_n", pa.int64()),
        ]
    )
    part_schema = pa.schema(
        [("pid", pa.int64()), ("key", pa.string()), ("n", pa.int64())]
    )
    N = np.int64(n_parts)

    def partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        keys = pc.cast(batch[key_col], pa.string())
        df = pd.DataFrame({"key": keys.to_numpy(zero_copy_only=False)})
        g = df.groupby("key", sort=False).size().reset_index(name="n")
        uniq = pa.array(g["key"].to_numpy(dtype=object), pa.string())
        pid = ((_md5_prefix_u64(uniq) >> np.uint64(32)).astype(np.int64)) % N
        return pa.table(
            {
                "pid": pa.array(pid, pa.int64()),
                "key": uniq,
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    slim = ds.select_columns([key_col]).map_batches(
        partials, batch_format="pyarrow"
    )

    def part_of(tbl: pa.Table, p: int) -> np.ndarray:
        return (tbl.column("pid").to_numpy() % p).astype(np.int64)

    def reduce_fn(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
        df = (
            tbl.to_pandas()
            .groupby(["pid", "key"], sort=False)["n"]
            .sum()
            .reset_index()
            .sort_values(["pid", "n", "key"], ascending=[True, False, True],
                         kind="mergesort")
        )
        pid = df["pid"].to_numpy().astype(np.int64)
        n = df["n"].to_numpy().astype(np.int64)
        starts = np.r_[True, pid[1:] != pid[:-1]]
        gidx = np.cumsum(starts) - 1
        n_groups = int(gidx[-1]) + 1
        first = np.nonzero(starts)[0]  # heaviest key row (sort order)
        return pa.table(
            {
                "partition_id": pa.array(pid[first], pa.int64()),
                "n_rows": pa.array(np.bincount(gidx, weights=n)
                                   .astype(np.int64), pa.int64()),
                "n_keys": pa.array(
                    np.bincount(gidx, minlength=n_groups).astype(np.int64),
                    pa.int64(),
                ),
                "top_key": pa.array(
                    df["key"].to_numpy(dtype=object)[first], pa.string()
                ),
                "top_key_n": pa.array(n[first], pa.int64()),
            }
        )

    return hash_exchange(
        slim, part_of, num_partitions, reduce_fn, out_schema.empty_table()
    )
