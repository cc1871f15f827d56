"""Incremental dedup: new batch vs existing baseline digest table."""

from __future__ import annotations

import pandas as pd
import pytest

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.pipelines.incremental import (
    IncrementalDedup,
    _digests,
)


@pytest.fixture()
def baseline_digests(ray_session):
    df = pd.DataFrame(
        {
            "repo": ["rA", "rA", "rB"],
            "path": ["x.py", "y.py", "z.py"],
            "commit": ["c"] * 3,
            "content": [b"alpha", b"beta", b"alpha"],
        }
    )
    return _digests(ray_session.data.from_pandas(df))


def run_inc(ray_session, baseline, rows):
    inc = ray_session.data.from_pandas(pd.DataFrame(rows))
    res = IncrementalDedup(PipelineConfig()).run(baseline, inc)
    return res, res.members.to_pandas().set_index("file_id")


def test_matches_and_new_groups(ray_session, baseline_digests):
    res, m = run_inc(
        ray_session,
        baseline_digests,
        {
            "repo": ["rC"] * 4,
            "path": ["p.py", "q.py", "r.py", "s.py"],
            "commit": ["c"] * 4,
            "content": [b"alpha", b"gamma", b"gamma", b"delta"],
        },
    )
    assert res.n_matched_baseline == 1
    p = m.loc["rC:p.py@c"]
    # duplicate of the baseline: never a keeper; keeper is the
    # lexicographically-smallest baseline copy (rA:x.py < rB:z.py)
    assert p.matched_baseline and not p.is_keeper
    assert p.baseline_keeper == "rA:x.py@c"
    # increment-only group: tuple-lexicographic keeper
    assert m.loc["rC:q.py@c"].is_keeper and not m.loc["rC:r.py@c"].is_keeper
    assert m.loc["rC:q.py@c"].baseline_keeper == ""
    # singleton keeps itself
    assert m.loc["rC:s.py@c"].is_keeper and not m.loc["rC:s.py@c"].matched_baseline


def test_empty_increment(ray_session, baseline_digests):
    import pyarrow as pa

    inc = ray_session.data.from_arrow(
        pa.table(
            {
                "repo": pa.array([], pa.string()),
                "path": pa.array([], pa.string()),
                "commit": pa.array([], pa.string()),
                "content": pa.array([], pa.binary()),
            }
        )
    )
    res = IncrementalDedup(PipelineConfig()).run(baseline_digests, inc)
    assert res.members.count() == 0
    assert res.n_matched_baseline == 0
    assert set(res.members.schema().names) >= {"file_id", "is_keeper"}


def test_same_sha_requires_same_size_is_impossible_but_handled(
    ray_session, baseline_digests
):
    # size participates in the group key alongside sha256 (mirrors the
    # full pipeline's size-then-hash grouping); equal content always
    # yields equal (size, sha) so matching is by content in practice
    res, m = run_inc(
        ray_session,
        baseline_digests,
        {
            "repo": ["rZ"],
            "path": ["only.py"],
            "commit": ["c"],
            "content": [b"beta"],
        },
    )
    assert res.n_matched_baseline == 1
    assert m.loc["rZ:only.py@c"].baseline_keeper == "rA:y.py@c"


def test_full_rescan_equivalence(ray_session):
    """Incremental(baseline, inc) must agree with a full DedupPipeline
    over baseline ∪ increment: same groups, same eventual keepers."""
    from duplicate_finder_ray.pipelines.dedup import DedupPipeline

    base_rows = pd.DataFrame(
        {
            "repo": ["r1"] * 3,
            "path": [f"b{i}.py" for i in range(3)],
            "commit": ["c"] * 3,
            "content": [b"one", b"two", b"one"],
        }
    )
    inc_rows = pd.DataFrame(
        {
            "repo": ["r2"] * 3,
            "path": [f"i{i}.py" for i in range(3)],
            "commit": ["c"] * 3,
            "content": [b"one", b"three", b"three"],
        }
    )
    baseline = _digests(ray_session.data.from_pandas(base_rows))
    res = IncrementalDedup(PipelineConfig()).run(
        baseline, ray_session.data.from_pandas(inc_rows)
    )
    m = res.members.to_pandas().set_index("file_id")

    full = DedupPipeline(PipelineConfig()).run_on(
        ray_session.data.from_pandas(pd.concat([base_rows, inc_rows]))
    )
    fm = full.members.to_pandas().set_index("file_id")
    # r2:i0 (content "one") joins the baseline group whose keeper is
    # r1:b0 — exactly what the full rescan elects
    assert not m.loc["r2:i0.py@c"].is_keeper
    assert m.loc["r2:i0.py@c"].baseline_keeper == "r1:b0.py@c"
    assert fm.loc["r1:b0.py@c"].is_keeper
    assert not fm.loc["r2:i0.py@c"].is_keeper
    # increment-only dup group ("three"): same keeper under both paths
    assert m.loc["r2:i1.py@c"].is_keeper
    assert fm.loc["r2:i1.py@c"].is_keeper
    assert not fm.loc["r2:i2.py@c"].is_keeper


class TestIncrementalNearDup:
    @staticmethod
    def _mk(ray_session, cfg, base_rows):
        from duplicate_finder_ray.stages import neardup
        from duplicate_finder_ray.stages.derive import add_identity

        wid = ray_session.data.from_pandas(base_rows).map_batches(
            add_identity, batch_format="pyarrow"
        )
        return neardup.signatures(
            wid.select_columns(["file_id", "content"]), cfg, emit_shingles=True
        ).materialize()

    @staticmethod
    def _docs():
        import numpy as np

        words = [f"w{i}" for i in range(60)]

        def doc(seed, n=120):
            r = np.random.default_rng(seed)
            return " ".join(r.choice(words, size=n).tolist())

        base_docs = [doc(i) for i in range(6)]
        near = base_docs[2].split()
        near[0], near[5] = "CHANGED", "ALSO"
        inc_docs = [" ".join(near), doc(100), doc(101)]
        t = inc_docs[1].split()
        t[3] = "X"
        inc_docs[2] = " ".join(t)
        return base_docs, inc_docs

    def test_joins_baseline_cluster_and_forms_new(self, ray_session):
        from duplicate_finder_ray.pipelines.incremental import IncrementalNearDup

        base_docs, inc_docs = self._docs()
        base = pd.DataFrame(
            {"repo": ["b"] * 6, "path": [f"f{i}.py" for i in range(6)],
             "commit": ["c"] * 6, "content": base_docs}
        )
        inc = pd.DataFrame(
            {"repo": ["i"] * 3, "path": [f"g{i}.py" for i in range(3)],
             "commit": ["c"] * 3, "content": inc_docs}
        )
        cfg = PipelineConfig(jaccard_threshold=0.5)
        res = IncrementalNearDup(cfg).run(
            self._mk(ray_session, cfg, base), ray_session.data.from_pandas(inc)
        )
        p = res.pairs.to_pandas()
        lab = res.labels.to_pandas().set_index("file_id")
        assert res.n_matched_baseline == 1
        assert lab.loc["i:g0.py@c"].component == "b:f2.py@c"
        assert (
            lab.loc["i:g1.py@c"].component
            == lab.loc["i:g2.py@c"].component
            == "i:g1.py@c"
        )
        # baseline×baseline pairs are never re-reported
        assert not (
            p.a.str.startswith("b:") & p.b.str.startswith("b:")
        ).any()

    def test_matches_full_rescan_on_increment_pairs(self, ray_session):
        """Pairs touching the increment must equal the full pipeline's
        increment-touching pairs over baseline ∪ increment (identical
        shingle/signature config ⇒ identical band collisions)."""
        from duplicate_finder_ray.pipelines.incremental import IncrementalNearDup
        from duplicate_finder_ray.pipelines.neardup import NearDupPipeline

        base_docs, inc_docs = self._docs()
        base = pd.DataFrame(
            {"repo": ["b"] * 6, "path": [f"f{i}.py" for i in range(6)],
             "commit": ["c"] * 6, "content": base_docs}
        )
        inc = pd.DataFrame(
            {"repo": ["i"] * 3, "path": [f"g{i}.py" for i in range(3)],
             "commit": ["c"] * 3, "content": inc_docs}
        )
        cfg = PipelineConfig(jaccard_threshold=0.5)
        res = IncrementalNearDup(cfg).run(
            self._mk(ray_session, cfg, base), ray_session.data.from_pandas(inc)
        )
        got = {
            (r.a, r.b, round(r.jaccard, 9))
            for r in res.pairs.to_pandas().itertuples()
        }
        full = NearDupPipeline(cfg).run_on(
            ray_session.data.from_pandas(pd.concat([base, inc]))
        )
        want = {
            (r.a, r.b, round(r.jaccard, 9))
            for r in full.pairs.to_pandas().itertuples()
            if r.a.startswith("i:") or r.b.startswith("i:")
        }
        assert got == want

    def test_empty_increment_near_dup(self, ray_session):
        import pyarrow as pa

        from duplicate_finder_ray.pipelines.incremental import IncrementalNearDup

        base = pd.DataFrame(
            {"repo": ["b"], "path": ["f.py"], "commit": ["c"],
             "content": ["some content words here beyond the shingle size ok"]}
        )
        cfg = PipelineConfig(jaccard_threshold=0.5)
        inc = ray_session.data.from_arrow(
            pa.table(
                {"repo": pa.array([], pa.string()),
                 "path": pa.array([], pa.string()),
                 "commit": pa.array([], pa.string()),
                 "content": pa.array([], pa.string())}
            )
        )
        res = IncrementalNearDup(cfg).run(self._mk(ray_session, cfg, base), inc)
        assert res.pairs.count() == 0
        assert res.labels.count() == 0
        assert res.n_matched_baseline == 0
