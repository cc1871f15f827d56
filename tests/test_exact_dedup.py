"""E2E exact-dedup pipeline tests over the tiny fixture corpus, mirroring
the reference's pipeline tests (/root/reference/tests/test_duplicate_finder.py)
plus a brute-force oracle comparison."""

import hashlib

import pandas as pd
import pytest

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.pipelines.dedup import DedupPipeline, render_text_report


def brute_force_groups(df: pd.DataFrame) -> dict[str, list[str]]:
    """O(n²)-spirit oracle: group file_ids by exact content; only groups
    of ≥2 count (reference semantics §1.2)."""
    fid = df["repo"] + ":" + df["path"] + "@" + df["commit"]
    by_content: dict[str, list[str]] = {}
    for f, c in zip(fid, df["content"]):
        by_content.setdefault(c, []).append(f)
    return {
        hashlib.sha256(c.encode()).hexdigest(): sorted(v)
        for c, v in by_content.items()
        if len(v) > 1
    }


@pytest.fixture()
def run(ray_session, tiny_ds):
    def _run(**cfg_kwargs):
        return DedupPipeline(PipelineConfig(**cfg_kwargs)).run_on(tiny_ds)

    return _run


class TestExactGroups:
    def test_matches_brute_force_oracle(self, run, tiny_corpus):
        members = run().members.to_pandas()
        got = {
            gid: sorted(sub["file_id"])
            for gid, sub in members.groupby("group_id")
        }
        assert got == brute_force_groups(tiny_corpus)

    def test_identical_pair_found(self, run):
        # mirrors reference test: two files with identical content form
        # one group (test_duplicate_finder.py:53-65)
        members = run().members.to_pandas()
        sha = hashlib.sha256(b"def f():\n    return 1\n").hexdigest()
        grp = members[members["group_id"] == sha]
        assert len(grp) == 2

    def test_no_false_groups(self, run, tiny_corpus):
        # distinct contents → no group (reference :68-76); same-size
        # different-content rows survive prefilter but form no group
        members = run().members.to_pandas()
        assert "abcd" not in set(tiny_corpus["content"][members.index.intersection([])])
        shas = {
            hashlib.sha256(c.encode()).hexdigest()
            for c in ("abcd", "abce", "unique content one\n")
        }
        assert not (set(members["group_id"]) & shas)

    def test_empty_files_group(self, run):
        members = run().members.to_pandas()
        sha_empty = hashlib.sha256(b"").hexdigest()
        assert len(members[members["group_id"] == sha_empty]) == 3

    def test_keeper_is_lexicographic_min(self, run):
        members = run().members.to_pandas()
        for _, sub in members.groupby("group_id"):
            keeper = sub.loc[sub["is_keeper"], "file_id"].iloc[0]
            assert keeper == min(sub["file_id"])
            assert sub["is_keeper"].sum() == 1

    def test_keeper_prefix_path_matches_raw_sort(self, ray_session):
        """Rank is the (repo, path, commit) TUPLE, not the joined file_id
        string: with LICENSE vs LICENSE.txt the '@' terminator in file_id
        sorts after '.', which would flip the keeper vs the reference's
        raw-path sorted(group)."""
        df = pd.DataFrame(
            [
                {"repo": "o/r", "path": "LICENSE.txt", "commit": "a" * 40,
                 "lang": "text", "content": "mit\n"},
                {"repo": "o/r", "path": "LICENSE", "commit": "a" * 40,
                 "lang": "text", "content": "mit\n"},
            ]
        )
        res = DedupPipeline(PipelineConfig()).run_on(
            ray_session.data.from_pandas(df)
        )
        members = res.members.to_pandas()
        keeper = members.loc[members["is_keeper"], "path"].iloc[0]
        # reference sorts raw paths: 'LICENSE' < 'LICENSE.txt'
        assert keeper == "LICENSE"

    def test_prefilter_modes_agree(self, run):
        base = run(prefilter_mode="fused").members.to_pandas()
        for mode in ("two_pass", "off"):
            other = run(prefilter_mode=mode).members.to_pandas()
            a = base.sort_values("file_id").reset_index(drop=True)
            b = other.sort_values("file_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b)

    def test_exclude_pattern_removes_file(self, run):
        # reference :79-87 / test_cli_args.py:53-59: excluding one side of
        # the planted pair dissolves its group
        members = run(exclude_patterns=["*temp*"]).members.to_pandas()
        sha = hashlib.sha256(b"planted duplicate\n").hexdigest()
        assert sha not in set(members["group_id"])
        assert not members["file_id"].str.contains("temp/").any()

    def test_include_only_logs(self, run):
        members = run(include_patterns=["*.log"]).members.to_pandas()
        assert len(members) == 0  # the .log dup's twin is filtered out

    def test_size_bounds(self, run):
        members = run(min_file_size_str="3", max_file_size_str="1KiB").members.to_pandas()
        # tiny pair ("xy", 2 B) and huge pair (4096 B) and multiblock must vanish
        sha_tiny = hashlib.sha256(b"xy").hexdigest()
        sha_huge = hashlib.sha256(b"B" * 4096).hexdigest()
        ids = set(members["group_id"])
        assert sha_tiny not in ids and sha_huge not in ids
        # empty-file group also vanishes (0 < min); planted pair stays
        assert hashlib.sha256(b"").hexdigest() not in ids
        assert hashlib.sha256(b"planted duplicate\n").hexdigest() in ids

    def test_zero_min_size_disables_bound(self, run):
        # truthiness semantics: min_size=0 keeps empty files (reference
        # duplicate_finder.py:143-148)
        members = run(min_file_size_str="0").members.to_pandas()
        assert hashlib.sha256(b"").hexdigest() in set(members["group_id"])

    def test_verify_content_same_as_hash_on_clean_input(self, run):
        plain = run().members.to_pandas().sort_values("file_id").reset_index(drop=True)
        verified = (
            run(verify_content=True)
            .members.to_pandas()
            .sort_values("file_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(plain, verified)

    def test_groups_table(self, run):
        res = run()
        groups = res.groups.to_pandas()
        members = res.members.to_pandas()
        assert set(groups["group_id"]) == set(members["group_id"])
        assert groups["n_files"].sum() == len(members)

    def test_deletion_tally(self, run, tiny_corpus):
        res = run()
        tally = res.tally()
        oracle = brute_force_groups(tiny_corpus)
        n_expected = sum(len(v) - 1 for v in oracle.values())
        assert tally["n_deleted"] == n_expected
        # freed bytes = sum of non-keeper sizes
        members = res.members.to_pandas()
        assert tally["bytes_freed"] == int(
            members.loc[~members["is_keeper"], "size"].sum()
        )

    def test_keepers_view(self, run):
        res = run()
        keepers = res.keepers().to_pandas()
        groups = res.groups.to_pandas()
        assert len(keepers) == len(groups)
        assert keepers["is_keeper"].all()


class TestEmptyInputs:
    def test_no_duplicates_keeps_schema(self, ray_session):
        """A prefilter that empties the stream must not erase the output
        schema (found by probing: empty groupby loses schema)."""
        df = pd.DataFrame(
            {
                "repo": ["a/b", "c/d"],
                "path": ["x.py", "y.py"],
                "commit": ["1" * 40, "2" * 40],
                "lang": ["python", "python"],
                "content": ["aaa", "bbbb"],
            }
        )
        res = DedupPipeline(PipelineConfig()).run_on(ray_session.data.from_pandas(df))
        schema = res.members.schema()
        assert "group_id" in schema.names and "is_keeper" in schema.names
        assert res.members.count() == 0
        assert res.tally() == {"n_deleted": 0, "bytes_freed": 0}


class TestMinimalSchema:
    def test_lang_column_optional(self, ray_session):
        """The library surface accepts the minimal (repo, path, commit,
        content) schema: lang is derived from the path extension (same
        convention as the filesystem source) when absent."""
        df = pd.DataFrame(
            {
                "repo": ["r"] * 4,
                "path": ["x.py", "y.py", "LICENSE", "LICENSE.txt"],
                "commit": [""] * 4,
                "content": ["dup", "dup", "mit\n", "mit\n"],
            }
        )
        res = DedupPipeline(PipelineConfig()).run_on(ray_session.data.from_pandas(df))
        members = res.members.to_pandas().set_index("path")
        assert len(members) == 4
        assert members.loc["x.py", "lang"] == "py"
        assert members.loc["LICENSE", "lang"] == "none"
        assert res.tally()["n_deleted"] == 2

    def test_groups_schema_survives_empty(self, ray_session):
        """groups (not just members) keeps its typed schema when the
        corpus has zero duplicates — Ray's groupby-aggregate over an
        empty stream otherwise yields a schema-less Dataset."""
        df = pd.DataFrame(
            {
                "repo": ["r", "r"],
                "path": ["a.py", "b.py"],
                "commit": ["", ""],
                "content": ["one", "twotwo"],
            }
        )
        res = DedupPipeline(PipelineConfig()).run_on(ray_session.data.from_pandas(df))
        schema = res.groups.schema()
        assert schema.names == ["group_id", "size", "n_files"]
        assert res.groups.count() == 0


class TestSorts:
    def test_sort_by_group_size(self, run):
        members = run(sort_by_group_size=True).members.to_pandas()
        n = members.drop_duplicates("group_id")["n_files"].tolist()
        assert n == sorted(n, reverse=True)

    def test_sort_by_file_size(self, run):
        members = run(sort_by_file_size=True).members.to_pandas()
        s = members.drop_duplicates("group_id")["size"].tolist()
        assert s == sorted(s, reverse=True)


class TestReport:
    def test_render_matches_reference_shape(self, run):
        members = run().members.to_pandas()
        text = render_text_report(members)
        assert "file(s)" in text and "Group 1/" in text
        # one header line per group
        n_groups = members["group_id"].nunique()
        assert text.count("Group ") == n_groups

    def test_empty_report(self):
        empty = pd.DataFrame(
            {"group_id": [], "rank": [], "size": [], "file_id": []}
        )
        assert render_text_report(empty) == "No duplicate files found.\n"


class TestPoisonRows:
    def test_null_content_skipped_with_warning(self, ray_session):
        """Reference skip-don't-crash parity (duplicate_finder.py:235-237):
        a NULL content cell (the table analogue of an unreadable file)
        drops that row, never the pipeline."""
        import pandas as pd

        from duplicate_finder_ray import DedupPipeline, PipelineConfig

        df = pd.DataFrame(
            {
                "repo": ["r"] * 4,
                "path": ["a.py", "b.py", "c.py", "d.py"],
                "commit": ["c"] * 4,
                "lang": ["py"] * 4,
                "content": ["x" * 10, "x" * 10, None, "y"],
            }
        )
        res = DedupPipeline(PipelineConfig()).run_on(
            ray_session.data.from_pandas(df)
        )
        got = sorted((r["path"], r["is_keeper"]) for r in res.members.take_all())
        assert got == [("a.py", True), ("b.py", False)]


class TestKeepersByDepth:
    def _members(self, rows):
        """rows: (file_id, repo, path, commit, group_id)"""
        import pyarrow as pa

        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "file_id": pa.array([r[0] for r in rows]),
                    "repo": pa.array([r[1] for r in rows]),
                    "path": pa.array([r[2] for r in rows]),
                    "commit": pa.array([r[3] for r in rows]),
                    "group_id": pa.array([r[4] for r in rows]),
                }
            )
        ).repartition(2)

    def test_shallowest_wins_ties_lex(self, ray_session):
        from duplicate_finder_ray.stages.exact import keepers_by_depth

        rows = [
            # group g1: vendored copy is deeper -> canonical src wins
            ("f1", "r1", "third_party/foo/src/lib.c", "c1", "g1"),
            ("f2", "r1", "src/lib.c", "c1", "g1"),
            # group g2: equal depth -> (repo, path, commit) lex tie-break
            ("f3", "rB", "a/x.py", "c1", "g2"),
            ("f4", "rA", "z/x.py", "c1", "g2"),
            ("f5", "rA", "z/x.py", "c0", "g2"),
        ]
        out = {
            r["group_id"]: r
            for r in keepers_by_depth(self._members(rows), 4).take_all()
        }
        assert out["g1"]["file_id"] == "f2" and out["g1"]["depth"] == 1
        assert out["g2"]["file_id"] == "f5"  # rA < rB, then commit c0 < c1
        assert len(out) == 2

    def test_partition_invariant(self, ray_session):
        import numpy as np

        from duplicate_finder_ray.stages.exact import keepers_by_depth

        rng = np.random.default_rng(3)
        rows = []
        for i in range(300):
            g = f"g{int(rng.integers(0, 40))}"
            depth = int(rng.integers(0, 4))
            path = "/".join(["d"] * depth + [f"f{i}.py"])
            rows.append((f"f{i}", f"r{int(rng.integers(0, 5))}", path, "c", g))
        a = sorted(
            (r["group_id"], r["file_id"])
            for r in keepers_by_depth(self._members(rows), 2).take_all()
        )
        b = sorted(
            (r["group_id"], r["file_id"])
            for r in keepers_by_depth(self._members(rows), 16).take_all()
        )
        assert a == b
        # python oracle: min by (depth, repo, path, commit) per group
        want = {}
        for fid, repo, path, commit, g in rows:
            key = (path.count("/"), repo, path, commit)
            if g not in want or key < want[g][0]:
                want[g] = (key, fid)
        assert a == sorted((g, fid) for g, (_, fid) in want.items())
