"""Fault-tolerant JSONL ingestion (sources/jsonl.py): malformed lines
quarantined instead of killing the job; declared schema enforced."""

import json

import pyarrow as pa
import pytest


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


class TestReadJsonlDocs:
    FIELDS = {"doc_id": "int64", "text": "string", "ok": "bool"}

    def test_good_bad_and_type_mismatch_rows(self, ray_session, tmp_path):
        from duplicate_finder_ray.sources.jsonl import (
            read_jsonl_docs,
            split_quarantine,
        )

        lines = [
            json.dumps({"doc_id": 1, "text": "hello", "ok": True}),
            '{"doc_id": 2, "text": "trunca',          # parse error
            json.dumps({"doc_id": 3}),                 # missing fields -> nulls, OK
            json.dumps([1, 2, 3]),                     # not an object
            json.dumps({"doc_id": "x", "text": "t"}),  # type mismatch
            json.dumps({"doc_id": True, "text": "t"}), # bool is NOT int64
            json.dumps({"doc_id": 7, "text": "bye", "extra": 1}),  # extra ignored
        ]
        path = _write(tmp_path, "docs.jsonl", lines)
        ds = read_jsonl_docs(path, self.FIELDS)
        good, quar = split_quarantine(ds)
        g = good.to_pandas().sort_values("doc_id", na_position="last")
        q = quar.to_pandas()
        assert list(g["doc_id"].dropna()) == [1, 3, 7]
        assert len(g) == 3  # rows 1, 3 (null text/ok), 7
        assert g.loc[g["doc_id"] == 3, "text"].isna().all()
        assert len(q) == 4
        errs = " | ".join(q["_error"])
        assert "parse" in errs and "not a JSON object" in errs and "type" in errs
        # quarantined rows keep no partial values
        assert q["doc_id"].isna().all()

    def test_all_good_roundtrip(self, ray_session, tmp_path):
        from duplicate_finder_ray.sources.jsonl import (
            read_jsonl_docs,
            split_quarantine,
        )

        rows = [{"doc_id": i, "text": f"d{i}", "ok": i % 2 == 0} for i in range(50)]
        path = _write(tmp_path, "ok.jsonl", [json.dumps(r) for r in rows])
        good, quar = split_quarantine(read_jsonl_docs(path, self.FIELDS))
        g = good.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert quar.count() == 0
        assert list(g["doc_id"]) == list(range(50))
        assert list(g["text"]) == [f"d{i}" for i in range(50)]
        assert g["ok"].tolist() == [i % 2 == 0 for i in range(50)]
        assert set(g.columns) == {"doc_id", "text", "ok"}

    def test_rejects_bad_field_decls(self, ray_session):
        from duplicate_finder_ray.sources.jsonl import read_jsonl_docs

        with pytest.raises(ValueError):
            read_jsonl_docs("/tmp/x.jsonl", {})
        with pytest.raises(ValueError):
            read_jsonl_docs("/tmp/x.jsonl", {"a": "decimal"})
