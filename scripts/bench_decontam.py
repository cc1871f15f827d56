"""Decontamination scale probe: annotate the cached 2.4 M-row bench
corpus against a ~1/499 benchmark subset (hash(path)-selected) and
report one JSON line. Evidence for the broadcast-semi-join scale shape:
one streaming pass over the training side, zero training-side shuffle.

Run standalone (owns its Ray session):
    python scripts/bench_decontam.py [corpus_dir]
Recorded result (BASELINE.md): 51.4 s single pass at 32 CPUs on
corpus_2400000_42_s32 (~46 600 docs/s) including the benchmark's
distributed distinct-shingle distillation.
"""
import json
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/graft_bench/corpus_2400000_42_s32"
    )
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from duplicate_finder_ray.stages.decontam import decontaminate

    def add_id(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            b.column("path").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"doc_id": pa.array(h), "text": b.column("content")})

    docs = ray.data.read_parquet(corpus, columns=["path", "content"]).map_batches(
        add_id, batch_format="pyarrow"
    )

    def split(keep: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b.column("doc_id").to_numpy() % 499 == 0
            return b.filter(pa.array(m if keep else ~m))

        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    t0 = time.perf_counter()
    out = decontaminate(train, bench, "doc_id", "text", k=5, concurrency=(4, 28))
    n = out.count()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"corpus": corpus, "rows": n, "wall_s": dt,
                      "docs_per_s": round(n / dt, 1)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
