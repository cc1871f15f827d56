"""Distributed column profiler — the data-quality audit every ingest
pipeline runs before anything else: per column, row/null counts, exact
distinct cardinality, and min/max.

Scale shape: ONE pass over the table emits two slim streams —
(a) per-block scalar partials, ≤ len(columns) rows per block, each
carrying typed native min/max (ints stay ints until the GLOBAL fold;
stringifying per block first would corrupt ordering: '10' < '9'),
folded on the driver (blocks × columns tiny rows); and (b) block-
distinct (column, value) pairs routed through
``salted_distinct_count`` — the column name is the textbook hot key
(only len(columns) keys exist), exactly what the salted exchange is
for. No task ever holds a column's full value set; the driver holds
O(blocks × columns) scalars plus the len(columns)-row result.

Column types: integer and string columns are profiled natively;
others are rejected (float min/max formatting is not engine-portable —
profile a lattice-scaled copy instead). Arrow's int→utf8 cast and
DuckDB's CAST(BIGINT AS VARCHAR) agree, so min/max stringify
identically on both sides of the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from duplicate_finder_ray.stages.join import _pa_type
from duplicate_finder_ray.stages.relational import salted_distinct_count

_PARTIAL_SCHEMA = pa.schema(
    [
        ("col_name", pa.string()),
        ("n", pa.int64()),
        ("n_null", pa.int64()),
        ("min_i", pa.int64()),
        ("max_i", pa.int64()),
        ("min_s", pa.string()),
        ("max_s", pa.string()),
    ]
)

OUT_SCHEMA = pa.schema(
    [
        ("col_name", pa.string()),
        ("n_rows", pa.int64()),
        ("n_null", pa.int64()),
        ("n_distinct", pa.int64()),
        ("min_value", pa.string()),
        ("max_value", pa.string()),
    ]
)


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str],
    n_salts: int = 4,
    parts_per_salt: int = 4,
) -> ray.data.Dataset:
    """One row per profiled column: (col_name, n_rows, n_null,
    n_distinct, min_value, max_value) — min/max as strings (native
    comparison first, stringified after the global fold), nulls
    excluded from distinct/min/max (SQL aggregate semantics)."""
    if not columns:
        raise ValueError("columns must be non-empty")
    schema = ds.schema()
    types = {c: _pa_type(t) for c, t in zip(schema.names, schema.types)}
    missing = [c for c in columns if c not in types]
    if missing:
        raise ValueError(f"missing columns: {missing}")
    is_int = {}
    for c in columns:
        if pa.types.is_integer(types[c]):
            is_int[c] = True
        elif pa.types.is_string(types[c]) or pa.types.is_large_string(
            types[c]
        ):
            is_int[c] = False
        else:
            raise ValueError(
                f"unsupported column type for profiling: {c}: {types[c]}"
            )

    proj = ds.select_columns(columns)

    # ---- stream (a): per-block scalar partials, typed native min/max
    def scalar_partial(t: pa.Table) -> pa.Table:
        rows = {f.name: [] for f in _PARTIAL_SCHEMA}
        for c in columns:
            col = t.column(c)
            valid = col.drop_null()
            mn = pc.min(valid).as_py() if len(valid) else None
            mx = pc.max(valid).as_py() if len(valid) else None
            rows["col_name"].append(c)
            rows["n"].append(len(col))
            rows["n_null"].append(col.null_count)
            rows["min_i"].append(mn if is_int[c] else None)
            rows["max_i"].append(mx if is_int[c] else None)
            rows["min_s"].append(None if is_int[c] else mn)
            rows["max_s"].append(None if is_int[c] else mx)
        return pa.table(rows, schema=_PARTIAL_SCHEMA)

    partials = proj.map_batches(
        scalar_partial, batch_format="pyarrow"
    ).take_all()

    folded: dict[str, dict] = {
        c: {"n": 0, "n_null": 0, "mn": None, "mx": None} for c in columns
    }
    for r in partials:
        f = folded[r["col_name"]]
        f["n"] += r["n"]
        f["n_null"] += r["n_null"]
        mn = r["min_i"] if is_int[r["col_name"]] else r["min_s"]
        mx = r["max_i"] if is_int[r["col_name"]] else r["max_s"]
        if mn is not None:
            f["mn"] = mn if f["mn"] is None else min(f["mn"], mn)
        if mx is not None:
            f["mx"] = mx if f["mx"] is None else max(f["mx"], mx)

    # ---- stream (b): exact distinct via the salted hot-key exchange
    def explode(t: pa.Table) -> pa.Table:
        outs = []
        for c in columns:
            vals = t.column(c).drop_null()
            if is_int[c]:
                vals = pc.cast(vals, pa.string())
            u = pc.unique(
                vals.combine_chunks()
                if isinstance(vals, pa.ChunkedArray)
                else vals
            )
            outs.append(
                pa.table(
                    {
                        "col_name": pa.array(
                            np.repeat(c, len(u)), pa.string()
                        ),
                        "value": u,
                    }
                )
            )
        return pa.concat_tables(outs).combine_chunks()

    nd = {
        r["col_name"]: r["n_distinct"]
        for r in salted_distinct_count(
            proj.map_batches(explode, batch_format="pyarrow"),
            "col_name",
            "value",
            n_salts=n_salts,
            parts_per_salt=parts_per_salt,
            alias="n_distinct",
        ).take_all()
    }

    out = {f.name: [] for f in OUT_SCHEMA}
    for c in columns:
        f = folded[c]
        out["col_name"].append(c)
        out["n_rows"].append(f["n"])
        out["n_null"].append(f["n_null"])
        out["n_distinct"].append(nd.get(c, 0))
        out["min_value"].append(
            None if f["mn"] is None else str(f["mn"])
        )
        out["max_value"].append(
            None if f["mx"] is None else str(f["mx"])
        )
    return ray.data.from_arrow(pa.table(out, schema=OUT_SCHEMA))
