"""Filesystem source — parity with the reference's directory walk.

The reference's primary input is a directory tree
(/root/reference/duplicate_finder/duplicate_finder.py:116-174: rglob,
regular non-symlink files only, OS errors skip-with-warning). Here the
same corpus becomes a code-table Dataset via ``ray.data.read_binary_files``
— one read task per file group, streaming, no driver-side walk of file
CONTENT (only the cheap path listing happens on the driver).

Mapping to the engine schema: ``repo`` = the scan root, ``path`` = the
path relative to it, ``commit`` = "" (filesystems are uncommitted), and
``content`` stays BINARY (files need not be UTF-8; every exact-dedup
stage — size, sha256, byte-verify — is binary-safe). Keeper rank is
computed over the ``(repo, path, commit)`` TUPLE (stages/exact.py), and
within one scan repo is constant and commit empty, so rank order equals
the reference's raw absolute-path sort — including prefix paths like
LICENSE vs LICENSE.txt, which the joined ``file_id`` string would
mis-order ('@' sorts after '.').
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa

import ray.data


def list_regular_files(root: str) -> list[str]:
    """The reference's scan predicate (duplicate_finder.py:136-141):
    regular files only, symlinks excluded, unreadable entries skipped
    with a warning, deterministic order."""
    base = Path(root).expanduser().resolve()
    out: list[str] = []
    for p in sorted(base.rglob("*")):
        try:
            if p.is_file() and not p.is_symlink():
                out.append(str(p))
        except OSError as exc:  # skip-don't-crash parity
            print(f"Warning: skipping {p}: {exc}")
    return out


def read_file_tree(root: str, size_prefilter: bool = False) -> ray.data.Dataset:
    """Directory tree → code-table Dataset (binary content).

    Schema: (repo, path, commit, lang, content:binary). Returns an empty
    schema-stable Dataset for an empty tree.

    size_prefilter=True applies the reference's headline work-avoidance
    at the SOURCE (duplicate_finder.py:42-48,186-189): files are stat'ed
    during the (driver-side, same as the reference) listing and only
    size-colliding files are ever OPENED — a file with a unique byte
    size cannot have a duplicate, so most of the tree is never read.
    Use for duplicate DETECTION only; the resulting table omits
    size-unique rows by construction."""
    base = str(Path(root).expanduser().resolve())
    files = list_regular_files(base)
    if size_prefilter and files:
        from collections import Counter

        sizes: list[int] = []
        kept: list[str] = []
        for p in files:
            try:
                sizes.append(os.stat(p).st_size)
                kept.append(p)
            except OSError as exc:
                print(f"Warning: skipping {p}: {exc}")
        counts = Counter(sizes)
        files = [p for p, s in zip(kept, sizes) if counts[s] > 1]
    empty = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("lang", pa.string()),
            ("content", pa.large_binary()),
        ]
    )
    if not files:
        return ray.data.from_arrow(empty.empty_table())

    # path table → parallel open+read INSIDE map_batches. (read_binary_files
    # resolves per-file metadata on the driver — measured 6.5s for 20k
    # paths vs 2s for the reads themselves; the driver should only ever
    # handle the path list.)
    paths_ds = ray.data.from_arrow(
        pa.table({"abspath": pa.array(files, pa.string())})
    ).repartition(max(2, min(64, len(files) // 256 + 1)))

    def read_files(batch: pa.Table) -> pa.Table:
        paths = batch.column("abspath").to_pylist()
        rel: list[str] = []
        lang: list[str] = []
        blobs: list[bytes] = []
        for p in paths:
            try:
                with open(p, "rb") as f:
                    blobs.append(f.read())
            except OSError as exc:  # skip-don't-crash parity
                print(f"Warning: skipping {p}: {exc}")
                continue
            rel.append(os.path.relpath(p, base))
            lang.append(os.path.splitext(p)[1].lstrip(".") or "none")
        return pa.table(
            {
                "repo": pa.array([base] * len(rel), pa.string()),
                "path": pa.array(rel, pa.string()),
                "commit": pa.array([""] * len(rel), pa.string()),
                "lang": pa.array(lang, pa.string()),
                "content": pa.array(blobs, pa.large_binary()),
            }
        )

    return paths_ds.map_batches(read_files, batch_format="pyarrow")
