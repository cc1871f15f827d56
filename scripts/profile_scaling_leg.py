"""Per-stage wall-clock of the scaling-leg pipelines (exact_dedup +
near_dup) over the cached 2.4M scaling corpus at a given CPU width —
the measurement tool behind BASELINE.md's stage-decomposition table.

Usage: python scripts/profile_scaling_leg.py [ncpus] [rows]
Prints one JSON line with per-stage seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NCPU = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_400_000

os.environ["RAY_GRAFT_CPUS"] = str(NCPU)
os.environ["GRAFT_BENCH_ROWS"] = str(ROWS)

import ray

ray.init(
    address="local", num_cpus=NCPU, include_dashboard=False,
    logging_level="ERROR",
)
import ray.data
from ray.data import DataContext

ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.read_op_min_num_blocks = max(8, 2 * NCPU)

import bench  # reuses the cached corpus builder

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.pipelines.dedup import DedupPipeline
from duplicate_finder_ray.pipelines.neardup import NearDupPipeline
from duplicate_finder_ray.stages import cc as cc_mod
from duplicate_finder_ray.stages import neardup

corpus = bench.corpus_path()

# warm worker pool exactly like bench.py
ray.data.read_parquet(corpus).map_batches(
    lambda b: b.slice(0, 1), batch_format="pyarrow"
).count()
warm = ray.data.read_parquet(corpus).limit(2000).materialize()
NearDupPipeline(PipelineConfig()).run_on(warm).labels.count()

cfg = PipelineConfig()
stages: dict[str, float] = {}


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    stages[name] = round(time.perf_counter() - t0, 2)
    return out


def _n(ds):
    return ds.count()


# ---- near_dup, stage by stage (mirrors NearDupPipeline.run_on) ----
from duplicate_finder_ray.stages.derive import add_identity

ds = ray.data.read_parquet(corpus)
with_id = ds.map_batches(add_identity, batch_format="pyarrow")
sigs = timed(
    "signatures",
    lambda: neardup.signatures(
        with_id.select_columns(["file_id", "content"]), cfg, emit_shingles=True
    ).materialize(),
)
bands = timed(
    "candidates",
    lambda: neardup.candidate_pairs(
        neardup.explode_bands(sigs, cfg), cfg
    ).materialize(),
)
verified = timed(
    "verify", lambda: neardup.verify_pairs_exact(bands, sigs, cfg).materialize()
)
labels = timed(
    "cc", lambda: cc_mod.connected_components(verified, cfg).materialize()
)
n_pairs, n_labels = verified.count(), labels.count()

# ---- exact dedup ----
t0 = time.perf_counter()
res = DedupPipeline(cfg).run_on(ray.data.read_parquet(corpus))
n_members = res.members.count()
stages["exact_dedup"] = round(time.perf_counter() - t0, 2)

stages["near_dup_total"] = round(
    stages["signatures"] + stages["candidates"] + stages["verify"] + stages["cc"], 2
)
print(json.dumps({
    "ncpus": NCPU, "rows": ROWS, "stages": stages,
    "n_pairs": n_pairs, "n_labels": n_labels, "n_members": n_members,
}))
ray.shutdown()
