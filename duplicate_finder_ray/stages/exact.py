"""Exact duplicate detection: size prefilter → sha256 groupby → groups.

Reproduces the reference's pipeline semantics (SURVEY.md §1.2):

* candidate ⇔ same size (reference duplicate_finder.py:166,176-196),
  duplicate ⇔ same sha256 (:199-239);
* groups are member-sorted lexicographically; the keeper is the
  lexicographic minimum (:246-250,309);
* singleton groups are not duplicates (:248-249);
* optional byte-exact verification refines hash groups (:427-463) —
  implemented CORRECTLY here (distinct subgroup ids per refined
  partition), unlike the reference's re-merge flaw (SURVEY.md §2.4).

Scale notes (100 TB / 10^12 rows):

* The heavy ``content`` column is dropped before any shuffle; only
  ``(file_id, repo, path, commit, lang, size, sha256)`` rows move.
* The size prefilter is a broadcast semi-join: per-batch partial counts
  feed a small ``groupby(size)`` whose >1 keys are ``ray.put`` once and
  probed with vectorized ``np.isin`` inside map_batches — raw rows never
  shuffle for the prefilter.
* The sha256 groupby shuffle is skew-free by construction (crypto-hash
  keys); group fan-in is bounded by real duplicate multiplicity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.functions.hashing import stable_hash_array

#: columns that flow into the shuffle (content intentionally absent)
MEMBER_COLS = ["file_id", "repo", "path", "commit", "lang", "size", "sha256"]

MEMBERS_SCHEMA = pa.schema(
    [
        ("file_id", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("size", pa.int64()),
        ("sha256", pa.string()),
        ("group_id", pa.string()),
        ("n_files", pa.int64()),
        ("rank", pa.int64()),
        ("is_keeper", pa.bool_()),
    ]
)

_EMPTY_MEMBERS = MEMBERS_SCHEMA.empty_table()


def candidate_sizes(ds: ray.data.Dataset) -> np.ndarray:
    """Distinct sizes observed on ≥2 rows — the prefilter key set.

    Pre-aggregates inside map_batches (one partial count row per distinct
    size per batch) before the groupby, so the shuffle carries per-batch
    partials, not raw rows (ray_guide 'Aggregation at scale'). The result
    (sizes bearing duplicates) is small relative to the corpus and is
    collected to the driver for broadcast.
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        values, counts = np.unique(batch.column("size").to_numpy(), return_counts=True)
        return pa.table(
            {"size": pa.array(values, pa.int64()), "partial": pa.array(counts, pa.int64())}
        )

    partials = ds.select_columns(["size"]).map_batches(
        partial_counts, batch_format="pyarrow"
    )
    # final reduce: per-batch partials are tiny (one row per distinct
    # size per batch). Up to a few hundred blocks, summing them on the
    # driver skips a whole shuffle barrier; past that, the volume
    # (blocks × distinct sizes) warrants the distributed aggregate.
    try:
        many_blocks = ds.num_blocks() > 256
    except Exception:
        many_blocks = True
    if many_blocks:
        counts = partials.groupby("size").aggregate(Sum("partial", alias_name="n"))
        pdf = counts.to_pandas()
    else:
        pdf = partials.to_pandas()
        # to_pandas() on an empty Dataset yields a 0-column frame
        if "size" in pdf.columns:
            pdf = pdf.groupby("size", sort=False)["partial"].sum().reset_index(name="n")
    if "n" not in pdf.columns:
        return np.empty(0, dtype=np.int64)
    dup_sizes = pdf.loc[pdf["n"] > 1, "size"].to_numpy(dtype=np.int64)
    return np.sort(dup_sizes)


def apply_size_prefilter(ds: ray.data.Dataset, sizes: np.ndarray) -> ray.data.Dataset:
    """Keep only rows whose size appears ≥2 times (reference
    _remove_single_files_from_file_list, duplicate_finder.py:176-196).

    ``sizes`` (sorted) is broadcast with ``ray.put`` ONCE; every task
    probes the shared-memory copy via zero-copy ``ray.get`` + vectorized
    ``np.isin`` — a broadcast semi-join, not a shuffle.
    """
    sizes_ref = ray.put(sizes)

    def probe(batch: pa.Table) -> pa.Table:
        keep = np.isin(batch.column("size").to_numpy(), ray.get(sizes_ref))
        return batch.filter(pa.array(keep))

    return ds.map_batches(probe, batch_format="pyarrow")


def duplicate_members(
    ds: ray.data.Dataset, cfg: PipelineConfig, group_on_size: bool = True
) -> ray.data.Dataset:
    """Exploded duplicate-membership table (the scale-friendly form of the
    reference's ``list[list[str]]`` result).

    Input rows carry MEMBER_COLS (plus ``content`` iff
    ``cfg.verify_content``). Output: one row per member of each duplicate
    group with ``group_id, n_files, rank, is_keeper`` appended; members
    are ranked in lexicographic ``(repo, path, commit)`` order — the
    tuple, not the joined file_id string, so prefix paths (LICENSE vs
    LICENSE.txt) order exactly like the reference's raw-path
    ``sorted(group)`` — keeper is rank 0. With verify_content, hash groups
    are refined to byte-identical subgroups with distinct
    ``group_id = sha256 ["#" k]`` (fixes the reference's re-merge flaw,
    duplicate_finder.py:443-461).

    One shuffle, key (size, sha256) — uniform, content never moves unless
    verifying. Each group is processed by one worker; duplicate groups are
    small (real-world multiplicity), so no per-group memory hazard.
    """
    keys = ["size", "sha256"] if group_on_size else ["sha256"]
    verify = cfg.verify_content

    if not verify:
        # fast path: ONE coarse barrier-free hash exchange on
        # siphash(sha256) % P (stages/exchange.py), then fully
        # vectorized pandas group kernels inside each partition — a
        # naive groupby(size, sha).map_groups pays a Python call per
        # GROUP (milliseconds × thousands of groups), and Ray Data's
        # sort-based groupby("pkey") paid a sample barrier + full sort
        # of the slim digest table for an order nothing needs (the same
        # fixed scaling term the verify shard exchange eliminated —
        # measured 9.2× on slim doc-keyed finishes).
        num_parts = max(8, cfg.parallelism)

        def emit_partition(part: pd.DataFrame) -> pa.Table:
            # rank on the (repo, path, commit) TUPLE, not the joined
            # file_id string: 'LICENSE' vs 'LICENSE.txt' must order the
            # way the reference's raw-path sort does ('@' terminator in
            # file_id sorts after '.', flipping the keeper otherwise)
            part = part.sort_values(
                [*keys, "repo", "path", "commit"], kind="mergesort"
            )
            grp = part.groupby(keys, sort=False)
            n = grp["file_id"].transform("size").astype("int64")
            part = part.assign(n_files=n)
            part = part[part["n_files"] >= 2]
            if len(part) == 0:
                return _EMPTY_MEMBERS
            grp2 = part.groupby(keys, sort=False)
            part = part.assign(
                rank=grp2.cumcount().astype("int64"),
                group_id=part["sha256"],
            )
            part = part.assign(is_keeper=part["rank"] == 0)
            return pa.Table.from_pandas(
                part[[f.name for f in MEMBERS_SCHEMA]],
                schema=MEMBERS_SCHEMA,
                preserve_index=False,
            )

        from duplicate_finder_ray.stages.exchange import hash_exchange

        def part_of(tbl: pa.Table, n: int) -> np.ndarray:
            # vectorized fixed-key siphash — never per-row crc32 Python
            # loops on a shuffle-key path, never salted builtin hash()
            h = stable_hash_array(
                tbl.column("sha256").to_numpy(zero_copy_only=False)
            )
            return (h % np.uint64(n)).astype(np.int64)

        def reduce_fn(p: int, tbl: pa.Table) -> pa.Table:
            return emit_partition(tbl.to_pandas())

        return hash_exchange(ds, part_of, num_parts, reduce_fn, _EMPTY_MEMBERS)

    def finalize(sub: pd.DataFrame, group_id: str) -> pd.DataFrame:
        sub = sub.copy()
        if "content" in sub.columns:
            sub = sub.drop(columns=["content"])
        sub["group_id"] = group_id
        sub["n_files"] = np.int64(len(sub))
        sub["rank"] = np.arange(len(sub), dtype=np.int64)
        sub["is_keeper"] = sub["rank"] == 0
        return sub[[f.name for f in MEMBERS_SCHEMA]]

    def emit_group(group: pd.DataFrame) -> pa.Table:
        if len(group) < 2:
            return _EMPTY_MEMBERS
        group = group.sort_values(["repo", "path", "commit"], kind="mergesort")
        sha = group["sha256"].iloc[0]
        if verify and "content" in group.columns:
            frames = []
            k = 0
            for _, sub in group.groupby("content", sort=False):
                if len(sub) < 2:
                    continue
                frames.append(finalize(sub, sha if k == 0 else f"{sha}#{k}"))
                k += 1
            if not frames:
                return _EMPTY_MEMBERS
            out = pd.concat(frames, ignore_index=True)
        else:
            out = finalize(group, sha)
        return pa.Table.from_pandas(out, schema=MEMBERS_SCHEMA, preserve_index=False)

    return ds.groupby(keys).map_groups(emit_group, batch_format="pandas")


GROUPS_SCHEMA = pa.schema(
    [("group_id", pa.string()), ("size", pa.int64()), ("n_files", pa.int64())]
)


def groups_from_members(members: ray.data.Dataset) -> ray.data.Dataset:
    """Collapse membership to one row per group ``(group_id, size,
    n_files)`` (reference result shape, duplicate_finder.py:241-255; the
    member lists stay exploded for scale). Unioned with a typed empty
    block so a zero-duplicate corpus keeps the output schema (Ray's
    groupby-aggregate over an empty stream otherwise yields a
    schema-less Dataset)."""
    agg = members.groupby("group_id").aggregate(
        Max("size", alias_name="size"),
        Count(alias_name="n_files"),
    )
    return agg.union(ray.data.from_arrow(GROUPS_SCHEMA.empty_table()))


def keepers_only(members: ray.data.Dataset) -> ray.data.Dataset:
    """The deduplicated view: one surviving row per duplicate group — the
    non-destructive analogue of the reference's deletion
    (duplicate_finder.py:297-351). Deletion ≡ dropping non-keepers."""
    return members.map_batches(
        lambda t: t.filter(t["is_keeper"]), batch_format="pyarrow"
    )


def deletion_tally(members: ray.data.Dataset) -> dict:
    """Count + freed bytes over non-keepers (reference tallies at
    duplicate_finder.py:306-340): the dry-run / delete summary."""
    doomed = members.map_batches(
        lambda t: t.filter(pc.invert(t["is_keeper"])), batch_format="pyarrow"
    )
    res = doomed.aggregate(Count(alias_name="n_deleted"), Sum("size", alias_name="bytes_freed"))
    return {
        "n_deleted": int(res.get("n_deleted") or 0),
        "bytes_freed": int(res.get("bytes_freed") or 0),
    }


def keepers_by_depth(
    members: ray.data.Dataset, num_partitions: int = 32
) -> ray.data.Dataset:
    """Alternative keeper POLICY: per duplicate group keep the
    SHALLOWEST path (fewest '/' separators), ties by (repo, path,
    commit) — the "keep the canonical copy, delete the vendored ones"
    rule real dedup runs want when duplicates differ only in nesting
    (src/lib.c vs third_party/foo/src/lib.c). The default pipeline
    keeper (lex-min tuple, reference rule) stays untouched; this is a
    re-selection over the members view.

    Scale shape: members rows are slim; ONE barrier-free hash exchange
    by hash(group_id) co-locates each group, then a vectorized
    mergesort + duplicated() first-per-group kernel — no per-group
    Python."""
    out_schema = pa.schema(
        [
            ("file_id", pa.string()),
            ("repo", pa.string()),
            ("path", pa.string()),
            ("depth", pa.int64()),
            ("group_id", pa.string()),
        ]
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "file_id": b["file_id"],
                "repo": b["repo"],
                "path": b["path"],
                "commit": b["commit"],
                "depth": pc.cast(pc.count_substring(b["path"], "/"), pa.int64()),
                "group_id": b["group_id"],
            }
        )

    def part_of(tbl: pa.Table, n: int) -> np.ndarray:
        g = tbl.column("group_id").to_numpy(zero_copy_only=False)
        return (stable_hash_array(g) % np.uint64(n)).astype(np.int64)

    def kernel(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
        df = tbl.to_pandas()
        df = df.sort_values(
            ["group_id", "depth", "repo", "path", "commit"], kind="mergesort"
        )
        k = df[~df["group_id"].duplicated()]
        return pa.Table.from_pandas(
            k[[f.name for f in out_schema]], schema=out_schema, preserve_index=False
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim = members.select_columns(
        ["file_id", "repo", "path", "commit", "group_id"]
    ).map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        slim, part_of, num_partitions, kernel, out_schema.empty_table()
    )
