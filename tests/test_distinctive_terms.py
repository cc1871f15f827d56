"""Unit tests for topk_per_group_by (multi-column ordering) and
distinctive_terms — the orderings and edge cases the driver gate
doesn't isolate."""

import pyarrow as pa

import ray.data

from duplicate_finder_ray.stages.relational import topk_per_group_by
from duplicate_finder_ray.stages.textstats import distinctive_terms


class TestTopkPerGroupBy:
    def test_multi_column_ordering(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "g": pa.array([1, 1, 1, 2], pa.int64()),
                    "a": pa.array([5, 5, 9, 1], pa.int64()),
                    "b": pa.array([2, 1, 7, 0], pa.int64()),
                }
            )
        )
        out = sorted(
            (r["g"], r["rank"], r["a"], r["b"])
            for r in topk_per_group_by(ds, "g", ["a", "b"], [False, True], 2)
            .take_all()
        )
        # group 1: (9,7) rank 1, then a=5 ties broken by b asc → (5,1)
        assert out == [(1, 1, 9, 7), (1, 2, 5, 1), (2, 1, 1, 0)]

    def test_rejects_mismatched_spec(self, ray_session):
        import pytest

        ds = ray.data.from_arrow(pa.table({"g": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError):
            topk_per_group_by(ds, "g", ["a"], [True, False], 1)


class TestDistinctiveTerms:
    def test_rare_token_beats_common_on_tf_tie(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(
                        [
                            "common rareword common rareword",  # tf tie 2-2
                            "common common xx",
                            "common yy zz",
                        ]
                    ),
                }
            )
        )
        out = {
            (r["doc_id"], r["rank"]): r
            for r in distinctive_terms(ds, "doc_id", "text", k=2, n_parts=2)
            .take_all()
        }
        # doc 1: tf(common)=tf(rareword)=2, df(rareword)=1 < df(common)=3
        assert out[(1, 1)]["token"] == "rareword"
        assert out[(1, 2)]["token"] == "common"
        assert out[(2, 1)]["token"] == "common"  # tf 2 beats xx's 1

    def test_empty_and_sub_token_docs_emit_nothing(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["", "word here"]),
                }
            )
        )
        rows = distinctive_terms(ds, "doc_id", "text", k=5, n_parts=2).take_all()
        assert {r["doc_id"] for r in rows} == {2}
        assert len(rows) == 2
