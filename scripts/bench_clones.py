"""Scale probe for Type-2 clone detection: run ``clone_groups_type2``
on >= 1 M synthetic code files with PLANTED renamed-twin pairs and
report wall time + exact group counts.

The points being evidenced at scale:

- normalization (3 RE2 passes) + sha256 run map-side; the content
  column never crosses a shuffle — only slim (clone_id, repo, file_id)
  rows enter the ONE clone-keyed exchange;
- group stats are partition-local vectorized groupbys.

Corpus: generated DISTRIBUTED and deterministically. Document ids 2k
and 2k+1 share an operator STRUCTURE derived from the bits of k
(`v7 + v7 - v7 ...`), but use different identifier names, digits and
whitespace — so every pair is a Type-2 clone group of exactly size 2
and nothing else collides (structures differ across k by construction:
distinct bit patterns yield distinct normalized strings).

Expected exact counts (checked, not eyeballed):
- exactly n/2 groups, every one with n_files == 2 and n_repos == 2
  (consecutive ids land in different repos mod 199).

Usage: python scripts/bench_clones.py [n_docs] [n_partitions]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data

N_BITS = 24  # structure bits — supports 2**24 pair keys


def make_code(n_docs: int) -> ray.data.Dataset:
    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        k = ids // 2
        ident = "v" + pd.Series(ids).astype(str)
        # twin rows (odd ids) get doubled spacing — normalization
        # strips it, the bytes differ (Type-2, never Type-1)
        sep = np.where(ids % 2 == 1, "  ", " ")
        parts = [ident]
        for b in range(N_BITS):
            op = np.where((k >> b) & 1 == 1, "+", "-")
            parts.append(pd.Series(sep).str.cat(pd.Series(op)).str.cat(
                pd.Series(sep)))
            parts.append(ident)
        content = parts[0].str.cat(parts[1:]) + "\n"
        id_str = pd.Series(ids).astype(str)
        return pa.table(
            {
                "repo": pa.array(("r" + pd.Series(ids % 199).astype(str)),
                                 pa.string()),
                "file_id": pa.array(
                    "r" + pd.Series(ids % 199).astype(str) + ":f"
                    + id_str + ".py@c" + id_str,
                    pa.string(),
                ),
                "content": pa.array(content, pa.string()),
            }
        )

    base = ray.data.range(n_docs).map_batches(
        lambda b: pa.table({"id": b.column("id")}), batch_format="pyarrow"
    )
    return base.map_batches(gen, batch_format="pyarrow")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if n_docs % 2:
        raise SystemExit("n_docs must be even (twin pairs)")

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from duplicate_finder_ray.stages.clones import clone_groups_type2

    docs = make_code(n_docs).materialize()  # exclude synthesis from timing
    t0 = time.perf_counter()
    groups = clone_groups_type2(docs, num_partitions=n_parts).materialize()
    wall = time.perf_counter() - t0

    n_groups = groups.count()
    df = groups.to_pandas()
    assert n_groups == n_docs // 2, (n_groups, n_docs // 2)
    assert (df["n_files"] == 2).all()
    assert (df["n_repos"] == 2).all()

    print(
        json.dumps(
            {
                "probe": "clone_groups_type2",
                "n_docs": n_docs,
                "n_partitions": n_parts,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "n_groups": int(n_groups),
                "all_pairs_exact": True,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
