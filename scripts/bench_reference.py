"""Head-to-head single-node throughput: the reference engine vs this
engine on the SAME real file tree (BASELINE.md "match-or-beat the
reference's single-node throughput at the same data scale").

Builds a deterministic file tree from the synthetic bench corpus,
then times:

1. the reference: ``python -m duplicate_finder <tree>`` from
   /root/reference (stdlib-only; stdout to /dev/null — it prints a
   progress line PER FILE, which would otherwise dominate),
2. this engine: DedupPipeline over ``read_file_tree`` in-process
   (Ray session init reported separately from pipeline wall time).

Prints one JSON line. Run standalone: ``python scripts/bench_reference.py``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = int(os.environ.get("GRAFT_REF_FILES", "20000"))
TREE = f"/tmp/graft_bench/ref_tree_{N_FILES}"
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def build_tree() -> None:
    if os.path.exists(os.path.join(TREE, "_DONE")):
        return
    from duplicate_finder_ray.sources.code_table import synthetic_code_corpus

    df = synthetic_code_corpus(N_FILES, seed=42)
    os.makedirs(TREE, exist_ok=True)
    for i, row in enumerate(df.itertuples()):
        sub = os.path.join(TREE, f"d{i % 200:03d}")
        if i < 200:
            os.makedirs(sub, exist_ok=True)
        with open(os.path.join(sub, f"f{i}.py"), "w") as f:
            f.write(row.content)
    with open(os.path.join(TREE, "_DONE"), "w") as f:
        f.write("ok")


def time_reference() -> float:
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-m", "duplicate_finder", TREE, "-j", str(NUM_CPUS)],
        cwd="/root/reference",
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        check=True,
    )
    return time.perf_counter() - t0


def time_ours() -> tuple[float, float, int]:
    import ray

    t_init0 = time.perf_counter()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    t_init = time.perf_counter() - t_init0

    from duplicate_finder_ray.config import PipelineConfig
    from duplicate_finder_ray.pipelines.dedup import DedupPipeline
    from duplicate_finder_ray.sources.filesystem import read_file_tree

    t0 = time.perf_counter()
    res = DedupPipeline(PipelineConfig()).run_on(
        read_file_tree(TREE, size_prefilter=True)
    )
    n_members = res.members.count()
    wall = time.perf_counter() - t0
    ray.shutdown()
    return wall, t_init, n_members


def main() -> None:
    build_tree()
    ref_s = time_reference()
    ours_s, init_s, n_members = time_ours()
    print(
        json.dumps(
            {
                "n_files": N_FILES,
                "reference_sec": round(ref_s, 3),
                "ours_sec": round(ours_s, 3),
                "ours_ray_init_sec": round(init_s, 3),
                "reference_files_per_sec": round(N_FILES / ref_s, 1),
                "ours_files_per_sec": round(N_FILES / ours_s, 1),
                "speedup": round(ref_s / ours_s, 2),
                "dup_members_found": n_members,
                "num_cpus": NUM_CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
