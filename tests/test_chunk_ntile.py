"""Unit tests for chunk_documents (stride windows, text rebuild) and
ntile_partitioned (SQL NTILE bucket arithmetic, partition isolation)."""

import pyarrow as pa
import pytest

import ray.data

from duplicate_finder_ray.stages.chunking import chunk_documents
from duplicate_finder_ray.stages.relational import ntile_partitioned


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


class TestChunkDocuments:
    def test_stride_windows_and_text(self, ray_session):
        ds = _docs([(1, "a b c d e")])
        out = sorted(
            (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(ds, "doc_id", "text", 3, 2).take_all()
        )
        assert out == [(0, 3, "a b c"), (1, 3, "c d e")]

    def test_short_doc_single_chunk(self, ray_session):
        ds = _docs([(1, "a b c"), (2, "x")])
        out = {
            r["doc_id"]: (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(ds, "doc_id", "text", 3, 2).take_all()
        }
        assert out[1] == (0, 3, "a b c")
        assert out[2] == (0, 1, "x")

    def test_trailing_partial_chunk(self, ray_session):
        ds = _docs([(1, "a b c d")])  # C=3 S=2 → [a b c], [c d]
        out = sorted(
            (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(ds, "doc_id", "text", 3, 2).take_all()
        )
        assert out == [(0, 3, "a b c"), (1, 2, "c d")]

    def test_empty_and_whitespace_docs_emit_nothing(self, ray_session):
        ds = _docs([(1, ""), (2, "   \n\t "), (3, "ok fine")])
        rows = chunk_documents(ds, "doc_id", "text", 4, 4).take_all()
        assert {r["doc_id"] for r in rows} == {3}

    def test_normalizes_interior_whitespace(self, ray_session):
        ds = _docs([(1, "  a\n\nb\tc  ")])
        (row,) = chunk_documents(ds, "doc_id", "text", 8, 8).take_all()
        assert row["chunk_text"] == "a b c" and row["n_tokens"] == 3

    def test_rejects_bad_params(self, ray_session):
        ds = _docs([(1, "a")])
        with pytest.raises(ValueError):
            chunk_documents(ds, "doc_id", "text", 4, 5)
        with pytest.raises(ValueError):
            chunk_documents(ds, "doc_id", "text", 0, 0)


class TestChunkSharePairs:
    def test_pasted_fragment_detected(self, ray_session):
        from duplicate_finder_ray.stages.chunking import chunk_share_pairs

        frag = "w1 w2 w3 w4"  # one aligned 4-token chunk
        ds = _docs(
            [
                (1, frag + " tail1 tail2 tail3 tail4"),
                (2, frag + " other stuff here now ok"),
                (3, "entirely different words in here friend"),
            ]
        )
        out = chunk_share_pairs(ds, "doc_id", "text", 4, 4, 4).take_all()
        assert [(r["a"], r["b"], r["n_shared_chunks"]) for r in out] == [(1, 2, 1)]

    def test_identical_docs_share_all_chunks(self, ray_session):
        from duplicate_finder_ray.stages.chunking import chunk_share_pairs

        text = " ".join(f"t{i}" for i in range(10))  # C=4,S=3 → 3 chunks
        ds = _docs([(7, text), (9, text)])
        (row,) = chunk_share_pairs(ds, "doc_id", "text", 4, 3, 4).take_all()
        assert (row["a"], row["b"]) == (7, 9) and row["n_shared_chunks"] == 3

    def test_repeated_chunk_counts_once(self, ray_session):
        from duplicate_finder_ray.stages.chunking import chunk_share_pairs

        # the same chunk value appears twice inside doc 1 (exact repeat
        # aligned at stride) but is ONE distinct shared value
        ds = _docs([(1, "a b a b"), (2, "a b x y")])
        (row,) = chunk_share_pairs(ds, "doc_id", "text", 2, 2, 4).take_all()
        assert row["n_shared_chunks"] == 1


class TestPackAssignments:
    def _counts(self, rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
                }
            )
        )

    def test_boundary_splitting(self, ray_session):
        from duplicate_finder_ray.stages.chunking import pack_assignments

        ds = self._counts([(1, 3), (2, 2), (3, 4)])  # stream: 9 tokens, B=4
        out = sorted(
            (r["doc_id"], r["pack_id"], r["tokens_in_pack"])
            for r in pack_assignments(ds, "doc_id", "n_tokens", 4).take_all()
        )
        assert out == [
            (1, 0, 3),
            (2, 0, 1), (2, 1, 1),
            (3, 1, 3), (3, 2, 1),
        ]
        # conservation: every token lands in exactly one pack
        assert sum(t for _, _, t in out) == 9

    def test_zero_token_docs_pack_nowhere(self, ray_session):
        from duplicate_finder_ray.stages.chunking import pack_assignments

        ds = self._counts([(1, 0), (2, 5)])
        out = pack_assignments(ds, "doc_id", "n_tokens", 8).take_all()
        assert [(r["doc_id"], r["pack_id"], r["tokens_in_pack"]) for r in out] \
            == [(2, 0, 5)]

    def test_block_count_invariant(self, ray_session):
        from duplicate_finder_ray.stages.chunking import pack_assignments

        import numpy as np

        rng = np.random.default_rng(11)
        rows = [(i, int(rng.integers(0, 40))) for i in range(200)]
        a = sorted(
            (r["doc_id"], r["pack_id"], r["tokens_in_pack"])
            for r in pack_assignments(
                self._counts(rows).repartition(2), "doc_id", "n_tokens", 64
            ).take_all()
        )
        b = sorted(
            (r["doc_id"], r["pack_id"], r["tokens_in_pack"])
            for r in pack_assignments(
                self._counts(rows).repartition(13), "doc_id", "n_tokens", 64
            ).take_all()
        )
        assert a == b and len(a) > 0

    def test_rejects_bad_budget(self, ray_session):
        from duplicate_finder_ray.stages.chunking import pack_assignments

        with pytest.raises(ValueError):
            pack_assignments(self._counts([(1, 1)]), "doc_id", "n_tokens", 0)


class TestNtilePartitioned:
    def _slim(self, rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "lang": pa.array([r[1] for r in rows], pa.string()),
                    "v": pa.array([r[2] for r in rows], pa.int64()),
                }
            )
        )

    def test_sql_ntile_distribution(self, ray_session):
        # 5 rows, 4 buckets → sizes 2,1,1,1 (first bucket gets extra)
        rows = [(i, "en", i * 10) for i in range(1, 6)]
        out = {
            r["doc_id"]: r["bucket"]
            for r in ntile_partitioned(
                self._slim(rows), "lang", ["v", "doc_id"], 4, num_partitions=3
            ).take_all()
        }
        assert out == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4}

    def test_fewer_rows_than_buckets(self, ray_session):
        rows = [(1, "en", 5), (2, "en", 3)]
        out = {
            r["doc_id"]: r["bucket"]
            for r in ntile_partitioned(
                self._slim(rows), "lang", ["v"], 4, num_partitions=2
            ).take_all()
        }
        assert out == {2: 1, 1: 2}  # ordered by v asc

    def test_partitions_isolated(self, ray_session):
        rows = [(1, "en", 1), (2, "en", 2), (3, "de", 1), (4, "de", 2)]
        out = {
            r["doc_id"]: r["bucket"]
            for r in ntile_partitioned(
                self._slim(rows), "lang", ["v"], 2, num_partitions=4
            ).take_all()
        }
        assert out == {1: 1, 2: 2, 3: 1, 4: 2}

    def test_rejects_bad_spec(self, ray_session):
        ds = self._slim([(1, "en", 1)])
        with pytest.raises(ValueError):
            ntile_partitioned(ds, "lang", ["missing"], 2)
        with pytest.raises(ValueError):
            ntile_partitioned(ds, "lang", ["v"], 0)


class TestGreedyPack:
    def _counts(self, rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
                }
            )
        )

    def test_matches_python_oracle_single_partition(self, ray_session):
        from duplicate_finder_ray.stages.chunking import greedy_pack

        rows = [(i, n) for i, n in enumerate([3, 4, 2, 5, 1, 6, 2])]
        out = {
            r["doc_id"]: (r["pack_id"], r["pack_fill"])
            for r in greedy_pack(
                self._counts(rows), "doc_id", "n_tokens", 8, 1
            ).take_all()
        }
        # python oracle: first-fit-sequential in doc_id order, budget 8
        packs, cur, acc = {}, 0, 0
        fills = {}
        for i, n in rows:
            if acc + n > 8 and acc > 0:
                cur, acc = cur + 1, 0
            acc += n
            packs[i] = cur
            fills[cur] = acc
        assert out == {i: (packs[i], fills[packs[i]]) for i, _ in rows}

    def test_budget_never_exceeded_except_singletons(self, ray_session):
        from duplicate_finder_ray.stages.chunking import greedy_pack

        import numpy as np

        rng = np.random.default_rng(5)
        rows = [(i, int(rng.integers(1, 300))) for i in range(400)]
        rows.append((999, 900))  # oversized doc
        out = greedy_pack(self._counts(rows), "doc_id", "n_tokens", 512, 8).take_all()
        by_pack = {}
        for r in out:
            by_pack.setdefault(r["pack_id"], []).append(r)
        for pid, members in by_pack.items():
            total = sum(r["n_tokens"] for r in members)
            assert all(r["pack_fill"] == total for r in members)
            if total > 512:  # only a singleton oversized doc may overflow
                assert len(members) == 1
        assert len(out) == 401

    def test_deterministic_across_parallelism(self, ray_session):
        from duplicate_finder_ray.stages.chunking import greedy_pack

        rows = [(i, 1 + i % 7) for i in range(200)]
        a = sorted(
            (r["doc_id"], r["pack_id"])
            for r in greedy_pack(
                self._counts(rows).repartition(3), "doc_id", "n_tokens", 16, 8
            ).take_all()
        )
        b = sorted(
            (r["doc_id"], r["pack_id"])
            for r in greedy_pack(
                self._counts(rows).repartition(11), "doc_id", "n_tokens", 16, 8
            ).take_all()
        )
        assert a == b

    def test_zero_token_docs_excluded(self, ray_session):
        from duplicate_finder_ray.stages.chunking import greedy_pack

        out = greedy_pack(
            self._counts([(1, 0), (2, 3)]), "doc_id", "n_tokens", 8, 2
        ).take_all()
        assert [r["doc_id"] for r in out] == [2]


class TestReassembleChunks:
    def test_roundtrip_identity_modulo_whitespace(self, ray_session):
        import pyarrow as pa

        from duplicate_finder_ray.stages.chunking import (
            chunk_documents,
            reassemble_chunks,
        )

        import numpy as np

        rng = np.random.default_rng(23)
        texts = []
        for i in range(40):
            n = int(rng.integers(1, 200))
            words = [f"w{rng.integers(0, 50)}" for _ in range(n)]
            texts.append("  " + "  ".join(words) + " ")  # messy whitespace
        texts.append("")          # empty doc: emits no chunks
        texts.append("   \t\n ")  # whitespace-only doc: emits no chunks
        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            )
        ).repartition(4)
        chunks = chunk_documents(ds, "doc_id", "text", 16, 12)
        got = {
            r["doc_id"]: r["text"]
            for r in reassemble_chunks(
                chunks, "doc_id", 16, 12, n_parts=8
            ).take_all()
        }
        want = {
            i: " ".join(t.split())
            for i, t in enumerate(texts)
            if t.strip() != ""
        }
        assert got == want

    def test_rejects_bad_params(self, ray_session):
        import pyarrow as pa

        from duplicate_finder_ray.stages.chunking import reassemble_chunks

        ds = ray_session.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1], pa.int64()),
                    "chunk_idx": pa.array([0], pa.int64()),
                    "chunk_text": pa.array(["x"]),
                }
            )
        )
        import pytest as _pytest

        with _pytest.raises(ValueError):
            reassemble_chunks(ds, "doc_id", 16, 0)
        with _pytest.raises(ValueError):
            reassemble_chunks(ds, "doc_id", 16, 17)
