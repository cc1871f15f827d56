"""10M-row planted-truth probes for connected components and
global_rank (round-3 VERDICT item 7) — certify the O(log d) CC
contraction and the sampled range-exchange balance at 10× the previous
probe scale, with ASSERTED (not eyeballed) invariants.

CC probe: N nodes in disjoint CHAINS of length L (the adversarial
shape for hash-to-min — diameter L forces the full log-d round
ladder). Planted truth: every node i belongs to the component whose
label is the chain head (i // L) * L; exactly N/L components.

Rank probe: N rows whose key column is the bijection
v = (i * 7919) mod N (7919 coprime to N), so the exact global rank of
every row EQUALS its value — rank(v) = v, all 10M asserted.

Usage::

    python scripts/bench_cc_rank.py [n_nodes] [n_rank_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

import ray
import ray.data

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.stages.cc import connected_components
from duplicate_finder_ray.stages.rank import global_rank

CHAIN = 1_000


def cc_probe(n_nodes: int) -> dict:
    n_nodes = (n_nodes // CHAIN) * CHAIN

    def make_edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        keep = ids % CHAIN != CHAIN - 1  # no edge across chain ends
        a = ids[keep]
        return pa.table(
            {
                "a": pa.array(np.char.zfill(a.astype("U9"), 9)),
                "b": pa.array(np.char.zfill((a + 1).astype("U9"), 9)),
            }
        )

    edges = ray.data.range(n_nodes).map_batches(make_edges, batch_format="pyarrow")
    rounds: list[dict] = []
    t0 = time.perf_counter()
    labels = connected_components(edges, PipelineConfig(), round_metrics=rounds)

    def verify(batch: pa.Table) -> pa.Table:
        node = batch.column("file_id").to_numpy(zero_copy_only=False).astype(np.int64)
        comp = batch.column("component").to_numpy(zero_copy_only=False).astype(np.int64)
        bad = int((comp != (node // CHAIN) * CHAIN).sum())
        heads = int((node == comp).sum())
        return pa.table({"bad": [bad], "heads": [heads], "rows": [len(node)]})

    agg = (
        labels.map_batches(verify, batch_format="pyarrow")
        .sum(["bad", "heads", "rows"])
    )
    dt = time.perf_counter() - t0
    assert agg["sum(bad)"] == 0, f"wrong component labels: {agg}"
    assert agg["sum(rows)"] == n_nodes, agg
    assert agg["sum(heads)"] == n_nodes // CHAIN, agg
    return {
        "nodes": n_nodes,
        "edges": n_nodes - n_nodes // CHAIN,
        "components": n_nodes // CHAIN,
        "chain_len": CHAIN,
        "cc_rounds": len(rounds),
        "max_bucket_rows": max((r["max_bucket_rows"] for r in rounds), default=0),
        "sec": round(dt, 2),
        "edges_per_sec": int((n_nodes - n_nodes // CHAIN) / dt),
    }


def rank_probe(n_rows: int) -> dict:
    def make_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return pa.table({"v": (ids * 7919) % n_rows})

    rows = ray.data.range(n_rows).map_batches(make_rows, batch_format="pyarrow")
    t0 = time.perf_counter()
    ranked = global_rank(rows, ["v"], out_col="rnk", num_partitions=64)

    def verify(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy()
        r = batch.column("rnk").to_numpy()
        return pa.table({"bad": [int((v != r).sum())], "rows": [len(v)]})

    agg = ranked.map_batches(verify, batch_format="pyarrow").sum(["bad", "rows"])
    dt = time.perf_counter() - t0
    assert agg["sum(bad)"] == 0, f"rank != planted value: {agg}"
    assert agg["sum(rows)"] == n_rows, agg
    return {"rows": n_rows, "sec": round(dt, 2), "rows_per_sec": int(n_rows / dt)}


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_rank = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    out = {"cc": cc_probe(n_nodes), "rank": rank_probe(n_rank)}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
