"""Code-table sources.

The engine's canonical input is a Parquet table
``(repo:string, path:string, commit:string, lang:string, content:string)``
(BASELINE.json input_hint) — the analogue of the reference's filesystem
walk (/root/reference/duplicate_finder/duplicate_finder.py:116-174).

For the driver's correctness gate and local tests we derive a
deterministic ``code_files`` table from the driver-provided ``documents``
table (/root/testdata/sf*/documents.parquet). The derivation is
**row-local** (no joins, no randomness) so the DuckDB oracle can express
the exact same table in SQL (``CODE_FILES_SQL``):

* duplicate injection: rows with ``doc_id % 10 ∈ {7,8,9}`` all carry the
  same synthetic content keyed by ``doc_id // 10`` → one exact-dup group
  of 3 per decade, with per-decade size variation for the size prefilter;
* glob-filter targets: a slice of paths land under ``logs/*.log``,
  ``temp/``, ``.git/`` and ``docs/*.md`` (FIXTURES.md §1 row class 5);
* everything else keeps its natural (unique) document text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

#: SQL body producing the identical table in DuckDB over the registered
#: ``documents`` view. Keep in lockstep with ``_derive_code_files_batch``.
CODE_FILES_SQL = """
SELECT
  'org' || CAST(doc_id % 7 AS VARCHAR) || '/repo' || CAST(doc_id % 23 AS VARCHAR) AS repo,
  CASE CAST(doc_id % 17 AS INTEGER)
    WHEN 3 THEN 'logs/f' || CAST(doc_id AS VARCHAR) || '.log'
    WHEN 5 THEN 'temp/f' || CAST(doc_id AS VARCHAR) || '.tmp'
    WHEN 7 THEN '.git/objects/f' || CAST(doc_id AS VARCHAR)
    WHEN 11 THEN 'docs/f' || CAST(doc_id AS VARCHAR) || '.md'
    ELSE 'src/f' || CAST(doc_id AS VARCHAR) || '.py'
  END AS path,
  substr(sha256('c' || CAST(doc_id AS VARCHAR)), 1, 40) AS "commit",
  lang,
  CASE WHEN (doc_id % 10) >= 7
    THEN 'DUP#' || CAST(doc_id // 10 AS VARCHAR) || chr(10) ||
         repeat('shared duplicate payload line' || chr(10),
                CAST(1 + ((doc_id // 10) % 5) AS INTEGER))
    ELSE text
  END AS content
FROM documents
"""


def _derive_code_files_batch(batch: pa.Table) -> pa.Table:
    """Vectorized Python twin of ``CODE_FILES_SQL`` (pandas/numpy string
    kernels; runs distributed inside map_batches)."""
    doc_id = batch.column("doc_id").to_numpy()
    text = batch.column("text").to_pylist()
    lang = batch.column("lang")

    ids = doc_id.astype(np.int64)
    id_str = pd.Series(ids).astype(str)
    repo = "org" + pd.Series(ids % 7).astype(str) + "/repo" + pd.Series(ids % 23).astype(str)

    mod17 = pd.Series(ids % 17)
    path = ("src/f" + id_str + ".py").where(mod17 != 3, "logs/f" + id_str + ".log")
    path = path.where(mod17 != 5, "temp/f" + id_str + ".tmp")
    path = path.where(mod17 != 7, ".git/objects/f" + id_str)
    path = path.where(mod17 != 11, "docs/f" + id_str + ".md")

    commit = [hashlib.sha256(f"c{i}".encode()).hexdigest()[:40] for i in ids]

    decade = ids // 10
    is_dup = (ids % 10) >= 7
    content = [
        (
            f"DUP#{d}\n" + "shared duplicate payload line\n" * int(1 + d % 5)
            if dup
            else t
        )
        for t, dup, d in zip(text, is_dup, decade)
    ]

    return pa.table(
        {
            "repo": pa.array(repo.tolist(), type=pa.string()),
            "path": pa.array(path.tolist(), type=pa.string()),
            "commit": pa.array(commit, type=pa.string()),
            "lang": lang,
            "content": pa.array(content, type=pa.string()),
        }
    )


def read_code_table(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a Parquet code table, pruning to the requested columns at the
    read (row-group/column pushdown — never load what a stage won't use)."""
    return ray.data.read_parquet(path, columns=columns)


def code_files_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Build the deterministic synthetic code table from
    ``{sf_dir}/documents.parquet`` (see module docstring)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(_derive_code_files_batch, batch_format="pyarrow")


def synthetic_code_corpus(
    n_rows: int,
    seed: int = 42,
    dup_fraction: float = 0.2,
    near_dup_fraction: float = 0.2,
    hot_license_fraction: float = 0.2,
    avg_lines: int = 40,
) -> pd.DataFrame:
    """Deterministic synthetic source-code corpus for tests and the bench
    (FIXTURES.md §1 row classes: exact-dup clusters, uniques, same-size
    different-content, near-dup variants, hot license header, mega-repo
    skew). Pure pandas; write to parquet and read back for pipeline runs.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(
        [
            "def", "return", "import", "class", "self", "for", "in", "if",
            "else", "while", "try", "except", "lambda", "yield", "assert",
            "value", "result", "data", "index", "count", "buffer", "node",
            "left", "right", "key", "item", "total", "parse", "emit", "load",
        ]
    )
    license_header = (
        "# Copyright (c) 2020 Example Corp\n"
        "# Licensed under the Apache License, Version 2.0\n"
        "# you may not use this file except in compliance with the License\n"
    )
    langs = np.array(["python", "c", "cpp", "java", "go", "js", "text"])

    rows: list[dict[str, str]] = []
    i = 0
    while len(rows) < n_rows:
        n_lines = int(rng.integers(avg_lines // 2, avg_lines * 2))
        body_lines = [
            " ".join(rng.choice(vocab, size=rng.integers(3, 9)).tolist())
            for _ in range(n_lines)
        ]
        body = "\n".join(body_lines) + "\n"
        if rng.random() < hot_license_fraction:
            body = license_header + body
        # mega-repo skew: ~30% of rows land in one repo
        repo = "big/monorepo" if rng.random() < 0.3 else f"org{i % 11}/repo{i % 37}"
        base = {
            "repo": repo,
            "path": f"src/pkg{i % 13}/mod{i}.py",
            "commit": hashlib.sha256(f"s{seed}c{i}".encode()).hexdigest()[:40],
            "lang": str(rng.choice(langs)),
            "content": body,
        }
        rows.append(base)
        i += 1
        r = rng.random()
        if r < dup_fraction and len(rows) < n_rows:
            # exact-dup cluster of 2-4 copies in other repos/paths
            for k in range(int(rng.integers(1, 4))):
                if len(rows) >= n_rows:
                    break
                rows.append(
                    {
                        **base,
                        "repo": f"fork{k}/of{i % 19}",
                        "path": f"vendor/copy{k}/mod{i}.py",
                        "commit": hashlib.sha256(
                            f"s{seed}c{i}k{k}".encode()
                        ).hexdigest()[:40],
                    }
                )
                i += 1
        elif r < dup_fraction + near_dup_fraction and len(rows) < n_rows:
            # near-dup variant: perturb a few lines of the base body
            variant = body_lines.copy()
            n_edits = max(1, len(variant) // 10)
            for _ in range(n_edits):
                j = int(rng.integers(0, len(variant)))
                variant[j] = " ".join(
                    rng.choice(vocab, size=rng.integers(3, 9)).tolist()
                )
            rows.append(
                {
                    **base,
                    "repo": f"near{i % 7}/var",
                    "path": f"src/variant/mod{i}.py",
                    "commit": hashlib.sha256(f"s{seed}v{i}".encode()).hexdigest()[:40],
                    "content": "\n".join(variant) + "\n",
                }
            )
            i += 1
    return pd.DataFrame(rows[:n_rows])


def synthetic_code_corpus_fast(
    n_rows: int,
    seed: int = 42,
    dup_fraction: float = 0.2,
    near_dup_fraction: float = 0.2,
    hot_license_fraction: float = 0.2,
    avg_lines: int = 40,
    line_pool: int = 1 << 14,
) -> pd.DataFrame:
    """Vectorized twin of ``synthetic_code_corpus`` for multi-million-row
    bench corpora (the row-loop generator is ~100M RNG calls at 2.4M
    rows — an hour of driver time; this one is numpy passes + one cheap
    C-level join per document, ~1M rows/min).

    Same row classes — exact-dup clusters (2-4 copies, distinct
    repo/path/commit), near-dup variants (~10% of lines edited), hot
    license header on ~20% of docs, mega-repo skew (~30% of rows in one
    repo) — but documents are assembled from a seeded pool of
    ``line_pool`` distinct lines, so content diversity is bounded by the
    pool, which is irrelevant for dedup benchmarking (shingle/band/hash
    distributions stay realistic) and makes generation deterministic and
    fast. NOT interchangeable with the slow generator's byte output —
    bench numbers regenerate whenever the corpus cache key changes."""
    rng = np.random.default_rng(seed)
    vocab = np.array(
        [
            "def", "return", "import", "class", "self", "for", "in", "if",
            "else", "while", "try", "except", "lambda", "yield", "assert",
            "value", "result", "data", "index", "count", "buffer", "node",
            "left", "right", "key", "item", "total", "parse", "emit", "load",
        ]
    )
    license_header = (
        "# Copyright (c) 2020 Example Corp\n"
        "# Licensed under the Apache License, Version 2.0\n"
        "# you may not use this file except in compliance with the License\n"
    )
    langs = np.array(["python", "c", "cpp", "java", "go", "js", "text"])

    # --- seeded pool of distinct lines (one vectorized pass) ---
    toks_per_line = rng.integers(3, 9, size=line_pool)
    flat = rng.integers(0, len(vocab), size=int(toks_per_line.sum()))
    words = vocab[flat]
    bounds = np.cumsum(toks_per_line)[:-1]
    lines = np.array([" ".join(w) for w in np.split(words, bounds)])

    # --- base documents ---
    # enough bases that after dup/near expansion we cover n_rows
    n_bases = n_rows
    n_lines = rng.integers(avg_lines // 2, avg_lines * 2, size=n_bases)
    idx_flat = rng.integers(0, line_pool, size=int(n_lines.sum()))
    doc_bounds = np.cumsum(n_lines)[:-1]
    doc_line_idx = np.split(idx_flat, doc_bounds)
    has_license = rng.random(n_bases) < hot_license_fraction

    # expansion class per base: exact-dup cluster / near-dup pair / unique
    r = rng.random(n_bases)
    n_copies = np.where(
        r < dup_fraction, rng.integers(1, 4, size=n_bases), 0
    )
    is_near = (r >= dup_fraction) & (r < dup_fraction + near_dup_fraction)

    contents: list[str] = []
    repos: list[str] = []
    paths: list[str] = []
    lines_list = lines.tolist()  # python-str join is 2x faster than np.str_

    i = 0
    big = rng.random(n_bases) < 0.3
    join = "\n".join
    for bi in range(n_bases):
        if i >= n_rows:
            break
        li = doc_line_idx[bi]
        body = join([lines_list[j] for j in li]) + "\n"
        if has_license[bi]:
            body = license_header + body
        contents.append(body)
        repos.append("big/monorepo" if big[bi] else f"org{i % 11}/repo{i % 37}")
        paths.append(f"src/pkg{i % 13}/mod{i}.py")
        base_i = i
        i += 1
        if n_copies[bi] and i < n_rows:
            for k in range(int(n_copies[bi])):
                if i >= n_rows:
                    break
                contents.append(body)
                repos.append(f"fork{k}/of{base_i % 19}")
                paths.append(f"vendor/copy{k}/mod{base_i}.py")
                i += 1
        elif is_near[bi] and i < n_rows:
            var = li.copy()
            n_edits = max(1, len(var) // 10)
            pos = rng.integers(0, len(var), size=n_edits)
            var[pos] = rng.integers(0, line_pool, size=n_edits)
            vbody = join([lines_list[j] for j in var]) + "\n"
            if has_license[bi]:
                vbody = license_header + vbody
            contents.append(vbody)
            repos.append(f"near{base_i % 7}/var")
            paths.append(f"src/variant/mod{base_i}.py")
            i += 1

    n = len(contents)
    ii = np.arange(n, dtype=np.int64)
    # commit ids: vectorized 64-bit hash of (seed, row) formatted as hex
    h = pd.util.hash_array(ii + np.int64(seed) * np.int64(1_000_003))
    commits = np.char.mod("%016x", h.astype(np.uint64))
    commits = np.char.add(commits, np.char.mod("%016x", (h * np.uint64(0x9E3779B97F4A7C15))))
    lang_col = langs[rng.integers(0, len(langs), size=n)]
    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": lang_col,
            "content": contents,
        }
    )
