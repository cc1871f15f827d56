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
