"""Unit tests for benchmark decontamination — semantics the driver
gate doesn't isolate: known-overlap detection, sub-k documents,
threshold routing, empty benchmark, unicode SQL-parity tokenization."""

import numpy as np
import pyarrow as pa

import ray.data

from duplicate_finder_ray.stages.decontam import decontaminate


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


class TestDecontaminate:
    def test_detects_shared_5gram(self, ray_session):
        bench = _docs([(100, "alpha beta gamma delta epsilon zeta")])
        train = _docs(
            [
                (1, "xx alpha beta gamma delta epsilon yy"),  # shares one
                (2, "totally different words here none match at all ok"),
            ]
        )
        out = {r["doc_id"]: r for r in
               decontaminate(train, bench, "doc_id", "text").take_all()}
        assert out[1]["contaminated"] and out[1]["n_hits"] == 1
        assert out[1]["n_shingles"] == 3
        assert not out[2]["contaminated"] and out[2]["n_hits"] == 0

    def test_sub_k_docs_never_contaminated(self, ray_session):
        bench = _docs([(9, "a b c d e")])
        train = _docs([(1, "a b c d")])  # only 4 tokens
        (row,) = decontaminate(train, bench, "doc_id", "text").take_all()
        assert row["n_shingles"] == 0 and not row["contaminated"]

    def test_threshold_gates_flag_not_counts(self, ray_session):
        bench = _docs([(9, "a b c d e f")])  # grams: abcde, bcdef
        train = _docs([(1, "a b c d e f")])  # both grams hit
        (r1,) = decontaminate(train, bench, "doc_id", "text",
                              threshold=3).take_all()
        assert r1["n_hits"] == 2 and not r1["contaminated"]
        (r2,) = decontaminate(train, bench, "doc_id", "text",
                              threshold=2).take_all()
        assert r2["n_hits"] == 2 and r2["contaminated"]

    def test_empty_benchmark(self, ray_session):
        bench = _docs([]).filter(lambda r: False)
        train = _docs([(1, "a b c d e f g")])
        (row,) = decontaminate(train, bench, "doc_id", "text").take_all()
        assert row["n_shingles"] == 3 and row["n_hits"] == 0
        assert not row["contaminated"]

    def test_unicode_tokenizes_ascii_runs(self, ray_session):
        # SQL-parity mode: non-ASCII codepoints separate tokens, so
        # 'héllo' contributes tokens 'h' and 'llo' on BOTH engines.
        bench = _docs([(9, "h llo w rld aaa")])
        train = _docs([(1, "héllo wörld aaa")])  # → h llo w rld aaa
        (row,) = decontaminate(train, bench, "doc_id", "text").take_all()
        assert row["n_shingles"] == 1 and row["n_hits"] == 1
        assert row["contaminated"]
