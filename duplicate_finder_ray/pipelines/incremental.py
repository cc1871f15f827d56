"""Incremental exact dedup: a NEW batch of files against an existing
corpus baseline.

Production shape for a continuously-ingested 100 TB corpus: the
baseline's digest table (file_id, repo, path, commit, size, sha256 —
what `DedupPipeline` / `ray_job.py` already persist) lives as Parquet;
only the small increment's content is read and hashed. No reference
counterpart (the reference rescans the whole tree each run,
duplicate_finder.py:116-174); the semantics extend the engine's
keep-first rule across runs: a file already present in the baseline
keeps ownership of its group, so every matching increment file is a
duplicate of it; groups formed only within the increment elect their
keeper by the usual (repo, path, commit) lexicographic rank.

Execution shape (the baseline is the BIG side, the increment the small
one — the asymmetry drives every choice):

1. increment → digest table via the same map_batches derivation the
   full pipeline uses (content dropped immediately after hashing);
2. ONE remote task lexsorts the increment digests: per-(size, sha256)
   rank by (repo, path, commit) and the sorted sha256 probe array —
   increment-sized, never the baseline;
3. the baseline digest table STREAMS through a map_batches semi-join
   probe (np.searchsorted against the broadcast sha array — zero-copy,
   no shuffle, no materialization of the 100 TB side);
4. the (increment-sized) matched rows reduce in one remote task to the
   per-key baseline keeper = min (repo, path, commit);
5. a final map_batches over the increment digests annotates
   matched_baseline / baseline_keeper / is_keeper.

Partitioning assumption (documented per north_rule): the INCREMENT
fits one task's memory (~10^8 rows); for increment ≈ corpus, run the
full `DedupPipeline` instead — incremental mode exists for small
deltas, where it avoids re-hashing the baseline entirely.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.stages.derive import (
    add_identity_and_sha256,
    drop_content,
)

MEMBERS_SCHEMA = pa.schema(
    [
        ("file_id", pa.string()),
        ("size", pa.int64()),
        ("sha256", pa.string()),
        ("group_id", pa.string()),
        ("is_keeper", pa.bool_()),
        ("matched_baseline", pa.bool_()),
        ("baseline_keeper", pa.string()),  # '' when unmatched
    ]
)


@dataclass
class IncrementalResult:
    #: one row per increment file (singletons included)
    members: ray.data.Dataset
    #: count of increment files matching an existing baseline group
    n_matched_baseline: int


def _digests(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(
        add_identity_and_sha256, batch_format="pyarrow"
    ).map_batches(drop_content, batch_format="pyarrow")


_DIG_COLS = ["file_id", "repo", "path", "commit", "size", "sha256"]


@ray.remote
def _rank_increment(*blocks: pa.Table) -> tuple:
    """(ranked increment digest table, sorted unique sha256 array).

    Rank = position of (repo, path, commit) within the (size, sha256)
    group — 0 elects the increment-local keeper, matching the engine's
    tuple sort (NOT the concatenated file_id string, which mis-orders
    prefix paths)."""
    blocks = tuple(b for b in blocks if "sha256" in b.column_names and len(b))
    if not blocks:
        empty = pa.table(
            {
                c: pa.array([], pa.int64() if c in ("size", "rnk") else pa.string())
                for c in _DIG_COLS + ["rnk"]
            }
        )
        return empty, np.empty(0, dtype=object)
    tbl = pa.concat_tables([b.select(_DIG_COLS) for b in blocks])
    sha = tbl.column("sha256").to_numpy(zero_copy_only=False)
    size = tbl.column("size").to_numpy()
    repo = tbl.column("repo").to_numpy(zero_copy_only=False)
    path = tbl.column("path").to_numpy(zero_copy_only=False)
    commit = tbl.column("commit").to_numpy(zero_copy_only=False)
    order = np.lexsort((commit, path, repo, size, sha))
    tbl = tbl.take(pa.array(order))
    sha_s, size_s = sha[order], size[order]
    new_grp = np.r_[
        True, (sha_s[1:] != sha_s[:-1]) | (size_s[1:] != size_s[:-1])
    ]
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(len(sha_s)), 0))
    rnk = np.arange(len(sha_s)) - grp_start
    tbl = tbl.append_column("rnk", pa.array(rnk.astype(np.int64)))
    return tbl, np.unique(sha)


@ray.remote
def _baseline_keepers(*blocks: pa.Table) -> dict:
    """Reduce matched baseline rows to {(size, sha256): keeper file_id},
    keeper = min (repo, path, commit) tuple."""
    blocks = tuple(b for b in blocks if "sha256" in b.column_names and len(b))
    out: dict = {}
    if not blocks:
        return out
    tbl = pa.concat_tables([b.select(_DIG_COLS) for b in blocks])
    sha = tbl.column("sha256").to_numpy(zero_copy_only=False)
    size = tbl.column("size").to_numpy()
    repo = tbl.column("repo").to_numpy(zero_copy_only=False)
    path = tbl.column("path").to_numpy(zero_copy_only=False)
    commit = tbl.column("commit").to_numpy(zero_copy_only=False)
    fid = tbl.column("file_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((commit, path, repo, size, sha))
    sha_s, size_s, fid_s = sha[order], size[order], fid[order]
    first = np.r_[
        True, (sha_s[1:] != sha_s[:-1]) | (size_s[1:] != size_s[:-1])
    ]
    for i in np.nonzero(first)[0]:
        out[(int(size_s[i]), sha_s[i])] = fid_s[i]
    return out


class IncrementalDedup:
    def __init__(self, cfg: PipelineConfig | None = None) -> None:
        self.cfg = cfg or PipelineConfig()

    def run(
        self,
        baseline_digests: ray.data.Dataset,
        increment: ray.data.Dataset,
    ) -> IncrementalResult:
        """baseline_digests: digest table (columns ⊇ _DIG_COLS) from a
        prior run — streamed, never materialized. increment: raw code
        table (repo, path, commit[, lang], content)."""
        inc_dig = _digests(increment).materialize()
        inc_refs = inc_dig.to_arrow_refs()
        if not inc_refs or inc_dig.count() == 0:
            return IncrementalResult(
                ray.data.from_arrow(MEMBERS_SCHEMA.empty_table()), 0
            )
        ranked_ref, sha_ref = _rank_increment.options(num_returns=2).remote(
            *inc_refs
        )

        def probe(batch: pa.Table) -> pa.Table:
            shas = ray.get(sha_ref)
            col = batch.column("sha256").to_numpy(zero_copy_only=False)
            if len(shas) == 0 or len(col) == 0:
                return batch.slice(0, 0)
            pos = np.searchsorted(shas, col)
            pos[pos >= len(shas)] = 0
            return batch.filter(pa.array(shas[pos] == col))

        matched = (
            baseline_digests.map_batches(probe, batch_format="pyarrow")
            .materialize()
        )
        keeper_ref = _baseline_keepers.remote(*matched.to_arrow_refs())

        def annotate(batch: pa.Table) -> pa.Table:
            keepers = ray.get(keeper_ref)
            size = batch.column("size").to_numpy()
            sha = batch.column("sha256").to_numpy(zero_copy_only=False)
            rnk = batch.column("rnk").to_numpy()
            # vectorized lookup: sorted composite keys + searchsorted
            if keepers:
                kk = np.array(
                    [f"{h}#{s}" for (s, h) in keepers.keys()], dtype=object
                )
                kv = np.array(list(keepers.values()), dtype=object)
                ko = np.argsort(kk)
                kk, kv = kk[ko], kv[ko]
                probe_keys = np.array(
                    [f"{h}#{int(s)}" for h, s in zip(sha, size)], dtype=object
                )
                pos = np.searchsorted(kk, probe_keys)
                pos[pos >= len(kk)] = 0
                hit = kk[pos] == probe_keys
                bk = np.where(hit, kv[pos], "")
            else:
                hit = np.zeros(len(batch), dtype=bool)
                bk = np.full(len(batch), "", dtype=object)
            is_keeper = np.where(hit, False, rnk == 0)
            return pa.table(
                {
                    "file_id": batch["file_id"],
                    "size": batch["size"],
                    "sha256": batch["sha256"],
                    "group_id": batch["sha256"],
                    "is_keeper": pa.array(is_keeper, pa.bool_()),
                    "matched_baseline": pa.array(hit, pa.bool_()),
                    "baseline_keeper": pa.array(bk, pa.string()),
                }
            )

        members = ray.data.from_arrow_refs([ranked_ref]).map_batches(
            annotate, batch_format="pyarrow"
        )
        members = members.materialize()
        n_matched = int(
            members.map_batches(
                lambda b: pa.table(
                    {
                        "n": pa.array(
                            [
                                int(
                                    pa.compute.sum(
                                        pa.compute.cast(
                                            b["matched_baseline"], pa.int64()
                                        )
                                    ).as_py()
                                    or 0
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            ).sum("n")
            or 0
        )
        return IncrementalResult(members, n_matched)
