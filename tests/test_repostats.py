"""Cross-repo duplicate analytics (stages/repostats.py) vs Python oracles."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from itertools import combinations

import pandas as pd
import pytest

from duplicate_finder_ray.stages.repostats import (
    dup_dir_groups,
    repo_overlap_pairs,
    vendored_content,
)


def _files_df() -> pd.DataFrame:
    """Small code-files table with known overlap structure. Contents
    A/B are vendored; C unique; dir multisets engineered so r1:src and
    r2:src match (same sha multiset, different filenames) and r3:src
    does not (extra file)."""
    rows = [
        # repo, path, sha256 ("sha:" prefix keeps them readable), size
        ("r1", "src/a.py", "A", 10),
        ("r1", "src/b.py", "B", 20),
        ("r2", "src/x.py", "A", 10),
        ("r2", "src/y.py", "B", 20),
        ("r3", "src/a.py", "A", 10),
        ("r3", "src/b.py", "B", 20),
        ("r3", "src/c.py", "C", 30),
        ("r1", "docs/d.md", "D", 5),
        ("r2", "docs/e.md", "D", 5),
        # duplicate sha twice in ONE dir (multiset, not set)
        ("r4", "src/p.py", "A", 10),
        ("r4", "src/q.py", "A", 10),
    ]
    return pd.DataFrame(rows, columns=["repo", "path", "sha256", "size"])


@pytest.fixture()
def files(ray_session):
    return ray_session.data.from_pandas(_files_df())


def test_repo_overlap_matches_bruteforce(files):
    got = (
        repo_overlap_pairs(files, num_partitions=4)
        .to_pandas()
        .sort_values(["repo_a", "repo_b"])
        .reset_index(drop=True)
    )
    by_sha = defaultdict(set)
    for r in _files_df().itertuples():
        by_sha[r.sha256].add(r.repo)
    want = Counter()
    for repos in by_sha.values():
        for a, b in combinations(sorted(repos), 2):
            want[(a, b)] += 1
    want_df = (
        pd.DataFrame(
            [(a, b, n) for (a, b), n in want.items()],
            columns=["repo_a", "repo_b", "n_shared"],
        )
        .sort_values(["repo_a", "repo_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)


def test_repo_overlap_cap_bounds_pairs(files):
    """With the cap at its floor (2), each content emits at most ONE
    pair (its two lexicographically-first repos)."""
    got = repo_overlap_pairs(files, num_partitions=4, max_repos_per_content=2)
    df = got.to_pandas()
    # sha A is in r1,r2,r3,r4 -> only (r1,r2) survives the cap
    a_pairs = df[(df["repo_a"] == "r1") & (df["repo_b"] == "r2")]
    assert not a_pairs.empty
    assert "r4" not in set(df["repo_b"])  # capped away
    with pytest.raises(ValueError):
        repo_overlap_pairs(files, max_repos_per_content=1)


def test_vendored_content_counts(files):
    got = (
        vendored_content(files, min_repos=2, num_partitions=4)
        .to_pandas()
        .sort_values("sha256")
        .reset_index(drop=True)
    )
    # A: 4 repos (r1,r2,r3,r4x2 files -> 5 files), B: 3 repos/3 files,
    # D: 2 repos/2 files; C is unique -> excluded
    want = pd.DataFrame(
        {
            "sha256": ["A", "B", "D"],
            "n_repos": [4, 3, 2],
            "n_files": [5, 3, 2],
            "size": [10, 20, 5],
            "wasted_bytes": [40, 40, 5],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dup_dir_groups_multiset_semantics(files):
    got = dup_dir_groups(files, num_partitions=4).to_pandas()
    # r1:src and r2:src share multiset {A,B}; r3:src has {A,B,C} (no
    # match); r4:src has {A,A} (no match); r1:docs and r2:docs share {D}
    key = set(zip(got["repo"], got["dir"]))
    assert key == {("r1", "src"), ("r2", "src"), ("r1", "docs"), ("r2", "docs")}
    h_ab = hashlib.md5(b"A,B").hexdigest()
    h_d = hashlib.md5(b"D").hexdigest()
    assert set(got["dir_hash"]) == {h_ab, h_d}
    assert (got[got["dir_hash"] == h_ab]["n_files"] == 2).all()


def test_dup_dir_no_duplicates_is_empty(ray_session):
    df = pd.DataFrame(
        {
            "repo": ["r1", "r2"],
            "path": ["src/a.py", "src/b.py"],
            "sha256": ["X", "Y"],
            "size": [1, 2],
        }
    )
    got = dup_dir_groups(ray_session.data.from_pandas(df))
    assert got.count() == 0
    assert set(got.schema().names) == {"dir_hash", "repo", "dir", "n_files"}


def test_rejects_bad_params(files):
    with pytest.raises(ValueError):
        repo_overlap_pairs(files, num_partitions=0)
    with pytest.raises(ValueError):
        vendored_content(files, min_repos=1)
    with pytest.raises(ValueError):
        dup_dir_groups(files, num_partitions=-1)


def test_fork_candidates_containment(files):
    from duplicate_finder_ray.stages.repostats import fork_candidates

    got = fork_candidates(files, min_containment_ppm=500_000, num_partitions=4)
    df = got.to_pandas().set_index(["repo_a", "repo_b"])
    # distinct contents: r1{A,B,D}=3, r2{A,B,D}=3, r3{A,B,C}=3, r4{A}=1
    # shared: (r1,r2)=3 -> ppm 1e6; (r1,r3)=2 -> 666666; (r1,r4)=1 ->
    # 1e6 (min side r4=1); (r2,r3)=2; (r2,r4)=1; (r3,r4)=1
    assert df.loc[("r1", "r2"), "containment_ppm"] == 1_000_000
    assert df.loc[("r1", "r3"), "containment_ppm"] == 666_666
    assert df.loc[("r1", "r4"), "containment_ppm"] == 1_000_000
    assert df.loc[("r1", "r2"), "n_shared"] == 3
    assert (df["containment_ppm"] >= 500_000).all()
    # tighter threshold drops the 2/3 pairs
    tight = fork_candidates(
        files, min_containment_ppm=700_000, num_partitions=4
    ).to_pandas()
    assert ("r1", "r3") not in set(zip(tight["repo_a"], tight["repo_b"]))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fork_candidates(files, min_containment_ppm=0)


def test_repo_content_counts(files):
    from duplicate_finder_ray.stages.repostats import repo_content_counts

    got = repo_content_counts(files, num_partitions=4).to_pandas()
    want = {"r1": 3, "r2": 3, "r3": 3, "r4": 1}
    assert dict(zip(got["repo"], got["n_contents"])) == want


def test_dup_rate_by_size(ray_session):
    from duplicate_finder_ray.stages.repostats import dup_rate_by_size

    df = pd.DataFrame(
        {
            "repo": ["r"] * 6,
            "path": [f"src/f{i}.py" for i in range(6)],
            # sizes: 5 (1 digit) x3 -> two dup (sha X), one unique;
            #        50 (2 digits) x2 -> both dup (sha Y); 500 unique
            "sha256": ["X", "X", "Z", "Y", "Y", "W"],
            "size": [5, 5, 5, 50, 50, 500],
        }
    )
    got = (
        dup_rate_by_size(ray_session.data.from_pandas(df), num_partitions=4)
        .to_pandas()
        .sort_values("size_digits")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "size_digits": [1, 2, 3],
            "n_files": [3, 2, 1],
            "n_dup_files": [2, 2, 0],
            "dup_rate_ppm": [666_666, 1_000_000, 0],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError):
        dup_rate_by_size(ray_session.data.from_pandas(df), num_partitions=0)


def test_key_skew_report(ray_session):
    import hashlib as _hl

    from duplicate_finder_ray.stages.diagnostics import key_skew_report

    # hot key 'mega' dominates; others spread
    df = pd.DataFrame({"k": ["mega"] * 50 + ["a", "b", "c", "d"] * 3})
    got = key_skew_report(
        ray_session.data.from_pandas(df).repartition(3), "k",
        n_parts=4, num_partitions=2,
    ).to_pandas()

    def pid(s):
        return int(_hl.md5(s.encode()).hexdigest()[:8], 16) % 4

    want = {}
    for k, n in df["k"].value_counts().items():
        p = pid(k)
        rows, keys, top = want.get(p, (0, 0, None))
        cand = (n, k)
        if top is None or (-cand[0], cand[1]) < (-top[0], top[1]):
            top = cand
        want[p] = (rows + n, keys + 1, top)
    assert len(got) == len(want)
    for r in got.itertuples():
        rows, keys, top = want[r.partition_id]
        assert (r.n_rows, r.n_keys, r.top_key, r.top_key_n) == (
            rows, keys, top[1], top[0],
        )
    mega = got[got["top_key"] == "mega"]
    assert len(mega) == 1 and mega.iloc[0]["top_key_n"] == 50
    import pytest as _pytest

    with _pytest.raises(ValueError):
        key_skew_report(ray_session.data.from_pandas(df), "k", n_parts=0)


def test_fork_families_transitive_closure(ray_session):
    from duplicate_finder_ray.stages.repostats import fork_families

    rows = [
        # chain up ← fork ← leaf: transitivity must join all three
        ("up", "1", "A", 1), ("up", "2", "B", 1),
        ("up", "3", "C", 1), ("up", "4", "D", 1),
        # fork: 3 of up's 4 contents + one new → pair with up (750k)
        ("fork", "1", "A", 1), ("fork", "2", "B", 1),
        ("fork", "3", "C", 1), ("fork", "4", "E", 1),
        # leaf: {E} only → 100% of leaf inside fork, but NOT ≥50% of up
        # directly (0 shared) — transitivity must pull it into the family
        ("leaf", "1", "E", 1),
        # island pair: share F fully, disconnected from the family
        ("is1", "1", "F", 1), ("is2", "1", "F", 1),
        # hermit: unique content → singleton, absent from output
        ("hermit", "1", "G", 1),
    ]
    df = pd.DataFrame(rows, columns=["repo", "path", "sha256", "size"])
    got = (
        fork_families(
            ray_session.data.from_pandas(df), num_partitions=4
        )
        .to_pandas()
        .sort_values("repo")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "repo": ["fork", "is1", "is2", "leaf", "up"],
            "family": ["fork", "is1", "is1", "fork", "fork"],
        }
    )
    pd.testing.assert_frame_equal(got, want)


def test_dir_rollup_matches_du(ray_session):
    from duplicate_finder_ray.stages.repostats import dir_rollup

    rows = [
        ("r1", "a/b/c/f1.py", "X", 10),
        ("r1", "a/b/f2.py", "X", 20),
        ("r1", "a/f3.py", "X", 40),
        ("r1", "top.py", "X", 80),      # no ancestor dir
        ("r2", "a/b/f4.py", "X", 100),  # same dir names, other repo
    ]
    df = pd.DataFrame(rows, columns=["repo", "path", "sha256", "size"])
    got = (
        dir_rollup(ray_session.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values(["repo", "dir"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [
            ("r1", "a", 3, 70),
            ("r1", "a/b", 2, 30),
            ("r1", "a/b/c", 1, 10),
            ("r2", "a", 1, 100),
            ("r2", "a/b", 1, 100),
        ],
        columns=["repo", "dir", "n_files", "total_bytes"],
    )
    pd.testing.assert_frame_equal(got, want)


def test_repo_size_gini_lattice(ray_session):
    from duplicate_finder_ray.stages.repostats import repo_size_gini

    def run(byte_map):
        rows = [
            (r, f"f{i}.py", "X", s)
            for r, sizes in byte_map.items()
            for i, s in enumerate(sizes)
        ]
        df = pd.DataFrame(rows, columns=["repo", "path", "sha256", "size"])
        return repo_size_gini(
            ray_session.data.from_pandas(df).repartition(2)
        ).to_pandas()

    # uniform distribution -> gini 0
    got = run({"a": [10], "b": [5, 5], "c": [10]})
    assert got.iloc[0].tolist() == [3, 30, 0]
    # totals 1,2,3,4 -> s1=30, n=4, tot=10 -> 1e6*(60-50)//40 = 250000
    got = run({"a": [1], "b": [2], "c": [3], "d": [4]})
    assert got.iloc[0].tolist() == [4, 10, 250_000]


def test_dedup_summary(files):
    from duplicate_finder_ray.stages.repostats import dedup_summary

    got = dedup_summary(files, num_partitions=4)
    # _files_df: 11 files; contents A(5 files,10B) B(3,20) C(1,30)
    # D(2,5) -> 4 distinct; dup groups A,B,D; dup files 10;
    # reclaimable = 4*10 + 2*20 + 1*5 = 85
    assert got.iloc[0].tolist() == [11, 4, 3, 10, 85]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_summary(files, num_partitions=0)
