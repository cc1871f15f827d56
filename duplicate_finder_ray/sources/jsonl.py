"""Fault-tolerant JSONL ingestion — the wire format web-scale text
corpora actually arrive in (one JSON object per line, gigabytes of
lines, a fraction of them truncated or corrupt).

``ray.data.read_json`` aborts the whole job on the first malformed
line; a 100 TB ingest cannot afford that. ``read_jsonl_docs`` reads
lines with ``ray.data.read_text`` (streaming, parallel over files and
byte ranges) and parses each batch with the C ``json`` decoder inside
``map_batches``, ROUTING bad rows instead of raising: every output
row carries ``_bad`` (bool) + ``_error`` (string), so the caller
splits good from quarantined rows with two cheap filters and writes
the quarantine sidecar next to the output — no row is silently
dropped, no job dies on one corrupt shard.

Schema handling: the caller declares the expected fields and their
Arrow types (strings/ints only — the document-metadata shapes);
missing fields become null, extra fields are ignored, type mismatches
quarantine the row. Declared > inferred at this scale: one odd shard
must not flip a column's type mid-job.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray
import ray.data

#: supported declared types (JSON scalar shapes a doc table needs)
_CASTS = {
    "string": (str, pa.string()),
    "int64": (int, pa.int64()),
    "float64": ((int, float), pa.float64()),
    "bool": (bool, pa.bool_()),
}


def read_jsonl_docs(
    paths: str | list[str],
    fields: dict[str, str],
) -> ray.data.Dataset:
    """Read JSONL into a Dataset with declared ``fields``
    (name → 'string' | 'int64' | 'float64' | 'bool'). Returns ALL
    rows; filter ``_bad`` to split clean rows from the quarantine.

    Bad-row classes handled: JSON parse errors, non-object lines,
    type-mismatched fields (bool is NOT accepted as int64 — JSON
    ``true`` in an int column is a corruption signal, not a 1).
    """
    if not fields:
        raise ValueError("fields must declare at least one column")
    for name, ty in fields.items():
        if ty not in _CASTS:
            raise ValueError(f"unsupported type for {name!r}: {ty!r}")

    names = list(fields)
    types = {n: _CASTS[t] for n, t in fields.items()}
    out_fields = [(n, types[n][1]) for n in names] + [
        ("_bad", pa.bool_()),
        ("_error", pa.string()),
    ]
    out_schema = pa.schema(out_fields)

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        cols: dict[str, list] = {n: [] for n in names}
        bad: list[bool] = []
        err: list[str | None] = []
        for line in lines:
            row_err = None
            obj = None
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    row_err = "not a JSON object"
            except (json.JSONDecodeError, TypeError) as e:
                row_err = f"parse: {e}"
            if row_err is None:
                for n in names:
                    v = obj.get(n)
                    pytypes, _ = types[n]
                    if v is not None and (
                        not isinstance(v, pytypes)
                        or (isinstance(v, bool) and pytypes is not bool)
                    ):
                        row_err = f"type: {n} = {type(v).__name__}"
                        break
            if row_err is None:
                for n in names:
                    cols[n].append(obj.get(n))
                bad.append(False)
                err.append(None)
            else:
                for n in names:
                    cols[n].append(None)
                bad.append(True)
                err.append(row_err)
        arrays = [pa.array(cols[n], types[n][1]) for n in names]
        arrays.append(pa.array(bad, pa.bool_()))
        arrays.append(pa.array(err, pa.string()))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return ray.data.read_text(paths).map_batches(
        parse, batch_format="pyarrow"
    )


def split_quarantine(
    ds: ray.data.Dataset,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(clean rows without the audit columns, quarantined rows with
    ``_error``). Two lazy filters over the same parse — Ray executes
    the read once per consumer; materialize upstream if both sides are
    consumed and the input re-read is expensive."""
    import pyarrow.compute as pc

    def good(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.invert(t["_bad"]))
        return keep.drop_columns(["_bad", "_error"])

    def quarantined(t: pa.Table) -> pa.Table:
        return t.filter(t["_bad"])

    return (
        ds.map_batches(good, batch_format="pyarrow"),
        ds.map_batches(quarantined, batch_format="pyarrow"),
    )
