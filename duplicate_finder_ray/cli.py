"""CLI — reference-parity knob surface over the Ray pipelines.

Mirrors every flag of the reference CLI
(/root/reference/duplicate_finder/cli_args.py:18-129 and the run-time
action flow duplicate_finder.py:78-110): positional input path, the
mutually-exclusive group sorts, include/exclude globs, min/max size
strings, report/delete-report paths, dry-run, interactive, parallelism,
verify-content — retargeted from a filesystem root to a Parquet code
table. "Deletion" is non-destructive by design (SURVEY.md §2.1 S5): it
writes the deduplicated table (keepers + non-duplicates) to
``--dedup-output`` instead of unlinking files; dry-run renders the same
decisions without writing.

Action precedence matches the reference (duplicate_finder.py:87-106):
interactive mode wins over --delete; --delete prompts ``y/[n]`` unless
--dry-run.
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Sequence

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.functions.sizes import format_size


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="find-dupes-ray",
        description=(
            "Find duplicate rows in a Parquet code table "
            "(repo, path, commit, lang, content) with Ray Data."
        ),
    )
    p.add_argument("input_path", help="Parquet file/dir of the code table")
    sorts = p.add_mutually_exclusive_group()
    sorts.add_argument(
        "-g", "--sort-by-group-size", action="store_true",
        help="sort duplicate groups by number of files (descending)",
    )
    sorts.add_argument(
        "-s", "--sort-by-file-size", action="store_true",
        help="sort duplicate groups by file size (descending)",
    )
    p.add_argument("-o", "--output", default=None, help="duplicates report file (text)")
    p.add_argument(
        "-e", "--exclude", nargs="*", default=None,
        help="glob patterns to exclude (matched on repo/path)",
    )
    p.add_argument(
        "-i", "--include", nargs="*", default=None,
        help="glob patterns to include (matched on repo/path)",
    )
    p.add_argument(
        "-d", "--delete", action="store_true",
        help="write the deduplicated table (non-destructive deletion)",
    )
    p.add_argument(
        "--dedup-output", default=None,
        help="output Parquet dir for --delete (default: <input>.dedup)",
    )
    p.add_argument(
        "-r", "--delete-report", default=None, help="deletion report file (text)"
    )
    p.add_argument(
        "-n", "--dry-run", action="store_true",
        help="show what would be deleted without writing output",
    )
    p.add_argument(
        "-t", "--interactive", action="store_true",
        help="choose the kept file per group interactively",
    )
    p.add_argument(
        "-j", "--parallelism", type=int, default=0,
        help="parallelism hint (<=0: min(32, cpu count))",
    )
    p.add_argument("-m", "--min-size", default=None, help='minimum size, e.g. "100", "5MB"')
    p.add_argument("-x", "--max-size", default=None, help='maximum size, e.g. "2.5 GiB"')
    p.add_argument(
        "-v", "--verify-content", action="store_true",
        help="byte-exact verification of hash groups",
    )
    p.add_argument(
        "--filesystem", action="store_true",
        help="treat input_path as a DIRECTORY TREE to scan (reference "
        "parity mode; content handled as binary, exact dedup only)",
    )
    p.add_argument(
        "--unlink", action="store_true",
        help="with --filesystem and --delete/--interactive: actually "
        "unlink the non-kept files (reference find-dupes semantics) "
        "instead of writing a deduplicated table. Honors --dry-run.",
    )
    p.add_argument(
        "--near-dup", action="store_true",
        help="also run MinHash/LSH near-duplicate clustering",
    )
    p.add_argument(
        "--jaccard-threshold", type=float, default=0.8,
        help="near-dup verify threshold (with --near-dup)",
    )
    p.add_argument(
        "--checkpoint-dir", default=None,
        help="with --near-dup: persist each stage (signatures, candidate "
        "pairs, verified pairs, cluster labels) as partitioned Parquet "
        "with per-partition lineage manifests; a re-run with the same "
        "config resumes from the last completed stage",
    )
    return p


def config_from_args(args: argparse.Namespace) -> PipelineConfig:
    return PipelineConfig(
        input_path=args.input_path,
        include_patterns=args.include,
        exclude_patterns=args.exclude,
        min_file_size_str=args.min_size,
        max_file_size_str=args.max_size,
        output_path=args.output,
        sort_by_group_size=args.sort_by_group_size,
        sort_by_file_size=args.sort_by_file_size,
        parallelism=args.parallelism,
        verify_content=args.verify_content,
        delete_duplicates=args.delete,
        delete_report_path=args.delete_report,
        interactive_mode=args.interactive,
        dry_run=args.dry_run,
        jaccard_threshold=args.jaccard_threshold,
    )


def print_duplicates(members_df, out=None) -> None:
    """Console listing (reference duplicate_finder.py:257-274)."""
    out = out if out is not None else sys.stdout
    if len(members_df) == 0:
        print("No duplicate files found.", file=out)
        return
    groups = list(members_df.groupby("group_id", sort=True))
    print(f"Found {len(groups)} group(s) of duplicate files:", file=out)
    for i, (_gid, sub) in enumerate(groups, start=1):
        sub = sub.sort_values("rank")
        size = int(sub["size"].iloc[0])
        print(
            f"\nGroup {i}/{len(groups)} ({len(sub)} file(s), "
            f"size: {format_size(size)}):",
            file=out,
        )
        for fid in sub["file_id"]:
            print(f"  {fid}", file=out)


def print_duplicates_stream(members, out=None) -> int:
    """Streaming twin of :func:`print_duplicates` for the main CLI
    flow: identical console bytes, but group-at-a-time from the sorted
    Dataset (pipelines/dedup.py:iter_member_groups) — the driver never
    holds the whole membership table (round-4 VERDICT item 8). Returns
    the group count."""
    from duplicate_finder_ray.pipelines.dedup import (
        count_groups,
        iter_member_groups,
    )

    out = out if out is not None else sys.stdout
    n_groups = count_groups(members)
    if n_groups == 0:
        print("No duplicate files found.", file=out)
        return 0
    print(f"Found {n_groups} group(s) of duplicate files:", file=out)
    for i, grp in enumerate(iter_member_groups(members), start=1):
        size = int(grp.column("size")[0].as_py())
        print(
            f"\nGroup {i}/{n_groups} ({len(grp)} file(s), "
            f"size: {format_size(size)}):",
            file=out,
        )
        for fid in grp.column("file_id").to_pylist():
            print(f"  {fid}", file=out)
    return n_groups


def interactive_decisions(members_df, input_fn=input, out=None):
    """Driver-side interactive keeper loop (reference
    duplicate_finder.py:353-425): per group prompt for a 1-based index to
    KEEP; empty input skips the group (nothing deleted). Returns the set
    of file_ids to drop. Not a distributed op by design (SURVEY.md §2.4
    G9)."""
    out = out if out is not None else sys.stdout
    to_drop: set[str] = set()
    groups = list(members_df.groupby("group_id", sort=True))
    for i, (_gid, sub) in enumerate(groups, start=1):
        sub = sub.sort_values("rank")
        fids = list(sub["file_id"])
        print(f"\nGroup {i}/{len(groups)} ({len(fids)} file(s)):", file=out)
        for j, fid in enumerate(fids, start=1):
            print(f"  {j}. {fid}", file=out)
        while True:
            raw = input_fn(
                "Enter the number of the file to KEEP (Enter to skip group): "
            ).strip()
            if raw == "":
                break
            try:
                keep = int(raw)
            except ValueError:
                print("Invalid input, try again.", file=out)
                continue
            if 1 <= keep <= len(fids):
                to_drop.update(fid for j, fid in enumerate(fids, 1) if j != keep)
                break
            print("Out of range, try again.", file=out)
    return to_drop


def render_delete_report(dropped, dry_run: bool, bytes_freed: int) -> str:
    """Deletion report (reference duplicate_finder.py:342-351,418-425)."""
    tag = "[would delete]" if dry_run else "Deleted:"
    lines = [f"{tag} {fid}" for fid in sorted(dropped)]
    lines.append("")
    lines.append(
        f"{'Would free' if dry_run else 'Freed'}: {format_size(bytes_freed)} "
        f"({len(dropped)} file(s))"
    )
    return "\n".join(lines) + "\n"


def main(argv: Sequence[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from duplicate_finder_ray.pipelines.dedup import DedupPipeline

    pipeline = DedupPipeline(cfg)
    if args.unlink and not args.filesystem:
        raise SystemExit("--unlink only applies to --filesystem mode")
    if args.filesystem:
        if args.near_dup:
            raise SystemExit("--near-dup requires a Parquet code table (text content)")
        from duplicate_finder_ray.sources.filesystem import read_file_tree

        result = pipeline.run_on(
            read_file_tree(args.input_path, size_prefilter=True)
        )
    else:
        result = pipeline.run(args.input_path)
    from duplicate_finder_ray.pipelines.dedup import write_text_report

    if "file_id" not in result.members.schema().names:
        raise RuntimeError("membership table missing file_id")

    # console + text report STREAM group-at-a-time (no driver-side
    # to_pandas of the membership table — round-4 VERDICT item 8); the
    # interactive/delete flows below are the only consumers that still
    # collect, and only when those modes are requested.
    print_duplicates_stream(result.members)
    if cfg.output_path:
        with open(cfg.output_path, "w") as f:
            write_text_report(result.members, f)
        print(f"\nReport saved to: {cfg.output_path}")

    if args.near_dup:
        from duplicate_finder_ray.pipelines.neardup import NearDupPipeline
        from duplicate_finder_ray.sources.code_table import read_code_table

        nd = NearDupPipeline(cfg)
        code = read_code_table(args.input_path)
        if args.checkpoint_dir:
            nres = nd.run_checkpointed(code, args.checkpoint_dir)
        else:
            nres = nd.run_on(code)
        # distributed counts only — the label table never reaches the
        # driver (round-4 VERDICT item 8)
        n_label_rows = nres.labels.count()
        n_clusters = (
            nres.labels.select_columns(["component"])
            .groupby("component")
            .count()
            .count()
            if n_label_rows
            else 0
        )
        print(
            f"\nNear-duplicate clusters: {n_clusters} "
            f"({n_label_rows} member file(s))"
        )

    # ---- action flow (reference duplicate_finder.py:87-106) ----------
    # interactive / delete decisions are inherently driver-side (a
    # human reads and answers), so ONLY these modes collect the
    # membership table
    members_df = (
        result.members.to_pandas()
        if (cfg.interactive_mode or cfg.delete_duplicates)
        else None
    )
    dropped: set[str] = set()
    if cfg.interactive_mode and len(members_df):
        dropped = interactive_decisions(members_df)
    elif cfg.delete_duplicates and len(members_df):
        if not cfg.dry_run:
            answer = input("Delete all duplicates keeping one per group? y/[n]: ")
            if answer.strip().lower() != "y":
                print("Aborted.")
                return 0
        dropped = set(members_df.loc[~members_df["is_keeper"], "file_id"])

    if cfg.interactive_mode or cfg.delete_duplicates:
        size_by_id = dict(zip(members_df.get("file_id", []), members_df.get("size", [])))
        bytes_freed = sum(int(size_by_id.get(f, 0)) for f in dropped)
        report = render_delete_report(dropped, cfg.dry_run, bytes_freed)
        print("\n" + report, end="")
        if cfg.delete_report_path:
            with open(cfg.delete_report_path, "w") as f:
                f.write(report)
        if not cfg.dry_run and dropped and args.unlink:
            # destructive filesystem deletion (reference
            # duplicate_finder.py:297-351: unlink behind the y/[n]
            # prompt above; OS errors skip-with-warning, never abort)
            import os as _os

            path_by_id = {
                fid: _os.path.join(r, p)
                for fid, r, p in zip(
                    members_df["file_id"], members_df["repo"], members_df["path"]
                )
            }
            n_unlinked = 0
            for fid in sorted(dropped):
                target = path_by_id.get(fid)
                if target is None:
                    continue
                try:
                    _os.remove(target)
                    n_unlinked += 1
                except OSError as exc:
                    print(f"Warning: could not delete {target}: {exc}")
            print(f"Unlinked {n_unlinked} file(s).")
        elif not cfg.dry_run and dropped:
            out_dir = args.dedup_output or args.input_path.rstrip("/") + ".dedup"
            from duplicate_finder_ray.stages.derive import add_identity

            if args.filesystem:
                from duplicate_finder_ray.sources.filesystem import read_file_tree

                source = read_file_tree(args.input_path)
            else:
                from duplicate_finder_ray.sources.code_table import read_code_table

                source = read_code_table(args.input_path)
            full = source.map_batches(add_identity, batch_format="pyarrow")
            drop_list = sorted(dropped)

            def keep_rows(batch):
                import numpy as np
                import pyarrow as pa

                mask = ~np.isin(
                    batch.column("file_id").to_numpy(zero_copy_only=False),
                    drop_list,
                )
                return batch.filter(pa.array(mask))

            full.map_batches(keep_rows, batch_format="pyarrow").write_parquet(out_dir)
            print(f"Deduplicated table written to: {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
