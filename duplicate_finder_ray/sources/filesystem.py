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
stage — size, sha256, byte-verify — is binary-safe). ``file_id`` then
equals ``root:relpath@``, whose lexicographic order within one scan
equals the reference's absolute-path order — so the keep-first rule
selects the same file the reference keeps.
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


def read_file_tree(root: str) -> ray.data.Dataset:
    """Directory tree → code-table Dataset (binary content).

    Schema: (repo, path, commit, lang, content:binary). Returns an empty
    schema-stable Dataset for an empty tree."""
    base = str(Path(root).expanduser().resolve())
    files = list_regular_files(base)
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

    ds = ray.data.read_binary_files(files, include_paths=True)

    def to_code_table(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        rel = [os.path.relpath(p, base) for p in paths]
        lang = [os.path.splitext(p)[1].lstrip(".") or "none" for p in paths]
        return pa.table(
            {
                "repo": pa.array([base] * len(paths), pa.string()),
                "path": pa.array(rel, pa.string()),
                "commit": pa.array([""] * len(paths), pa.string()),
                "lang": pa.array(lang, pa.string()),
                "content": pa.compute.cast(batch["bytes"], pa.large_binary()),
            }
        )

    return ds.map_batches(to_code_table, batch_format="pyarrow")
