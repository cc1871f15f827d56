"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf and compares row count,
column names, and an order-insensitive value hash against the matching
``oracle_sql()`` via DuckDB. Usage::

    python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
        if df.shape[1] == 0:
            # to_pandas() on an EMPTY Dataset drops the schema (known
            # gotcha); rebuild the columns so 0-row results still
            # compare on column names
            df = pd.DataFrame(columns=result.schema().names)
        return df
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive hash: sort columns by name, canonicalize values,
    sort rows, hash. Mirrors the driver's described comparison."""
    import hashlib

    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None or v != v:
            return "<null>"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    rows = sorted(
        ",".join(canon(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


# -- local-only oracles -----------------------------------------------------
# The driver's DuckDB runs ``oracle_sql()`` strings verbatim and cannot
# register Python UDFs, so queries whose twin needs one (deflate has no
# DuckDB builtin) stay rows-only IN THE DRIVER. This gate registers the
# UDF locally and hash-checks them anyway, closing the oracle set at
# 100% for local verification.


def _register_local_udfs(con) -> None:
    import zlib

    def zdeflate_len(s: str) -> int:
        # exact twin of stages/textstats.py:compression_ratios (level 6)
        return len(zlib.compress(s.encode(), 6))

    con.create_function("zdeflate_len", zdeflate_len, ["VARCHAR"], "BIGINT")


#: oracles usable only by THIS gate (Python-UDF-backed); the driver's
#: ``oracle_sql()`` intentionally omits these names (rows-only there)
LOCAL_ORACLES = {
    "compression_ratios": """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       zdeflate_len(text) AS n_compressed,
       zdeflate_len(text) * 1000000
         // greatest(octet_length(encode(text)), 1) AS compress_ppm
FROM documents
""",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    _register_local_udfs(con)

    only = set(sys.argv[2:])  # optional: check just these query names
    failures = 0
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        got = to_pandas(fn(sf_dir))
        sql = e.oracle_sql().get(name) or LOCAL_ORACLES.get(name)
        if sql is None:
            print(f"  {name:32s} rows={len(got):7d}  (rows-only, no oracle)")
            continue
        want = con.execute(sql).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"  {name:32s} {status} rows={len(got)}/{len(want)} "
            f"cols={'=' if ok_cols else sorted(got.columns)} hash={'=' if ok_hash else 'X'}"
        )
        if status == "FAIL":
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
