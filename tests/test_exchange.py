"""Unit tests for the barrier-free hash-exchange primitive."""

import numpy as np
import pyarrow as pa

import ray.data

from duplicate_finder_ray.stages.exchange import hash_exchange

_EMPTY = pa.schema([("k", pa.int64()), ("n", pa.int64())]).empty_table()


def _make_fns():
    # closures, not module-level functions: workers can't import the
    # tests package, and closures pickle by value
    def part(tbl: pa.Table, n: int) -> np.ndarray:
        return (tbl.column("k").to_numpy() % n).astype(np.int64)

    def count_reduce(p: int, tbl: pa.Table) -> pa.Table:
        ks, counts = np.unique(tbl.column("k").to_numpy(), return_counts=True)
        return pa.table(
            {"k": pa.array(ks, pa.int64()), "n": pa.array(counts, pa.int64())}
        )

    return part, count_reduce


class TestHashExchange:
    def test_counts_match_groupby(self, ray_session):
        rng = np.random.default_rng(0)
        ks = rng.integers(0, 50, size=10_000)
        ds = ray_session.data.from_arrow(
            pa.table({"k": pa.array(ks, pa.int64())})
        ).repartition(7)
        part, count_reduce = _make_fns()
        out = hash_exchange(ds, part, 5, count_reduce, _EMPTY).take_all()
        got = {r["k"]: r["n"] for r in out}
        want = dict(zip(*np.unique(ks, return_counts=True)))
        assert got == {int(k): int(v) for k, v in want.items()}

    def test_partitions_are_disjoint_and_complete(self, ray_session):
        ks = np.arange(1000)
        ds = ray_session.data.from_arrow(pa.table({"k": pa.array(ks, pa.int64())}))

        def tag_reduce(p: int, tbl: pa.Table) -> pa.Table:
            kv = tbl.column("k").to_numpy()
            assert (kv % 4 == p).all()  # every row landed in its partition
            return pa.table(
                {
                    "k": pa.array(kv, pa.int64()),
                    "n": pa.array(np.full(len(kv), p, dtype=np.int64)),
                }
            )

        part, _ = _make_fns()
        out = hash_exchange(ds, part, 4, tag_reduce, _EMPTY).take_all()
        seen = sorted(r["k"] for r in out)
        assert seen == list(range(1000))

    def test_empty_source_keeps_schema(self, ray_session):
        ds = ray_session.data.from_arrow(
            pa.table({"k": pa.array([], pa.int64())})
        )
        part, count_reduce = _make_fns()
        out = hash_exchange(ds, part, 3, count_reduce, _EMPTY)
        assert out.count() == 0
        assert out.schema().names == ["k", "n"]

    def test_out_of_range_partition_ids_fail_loudly(self, ray_session):
        # the old behavior silently dropped rows whose pid fell outside
        # [0, n_parts) — a buggy partitioner must be an error, not data
        # loss
        import pytest

        ds = ray_session.data.from_arrow(
            pa.table({"k": pa.array([1, 2, 3], pa.int64())})
        )

        def bad_part(tbl: pa.Table, n: int) -> np.ndarray:
            return tbl.column("k").to_numpy().astype(np.int64)  # 3 >= n

        _, count_reduce = _make_fns()
        with pytest.raises(Exception, match="outside"):
            hash_exchange(ds, bad_part, 3, count_reduce, _EMPTY).take_all()

        def negative_part(tbl: pa.Table, n: int) -> np.ndarray:
            return -np.ones(len(tbl), dtype=np.int64)

        with pytest.raises(Exception, match="outside"):
            hash_exchange(
                ds, negative_part, 3, count_reduce, _EMPTY
            ).take_all()

    def test_single_partition(self, ray_session):
        ds = ray_session.data.from_arrow(
            pa.table({"k": pa.array([1, 1, 2], pa.int64())})
        )
        part, count_reduce = _make_fns()
        out = hash_exchange(ds, part, 1, count_reduce, _EMPTY).take_all()
        assert {r["k"]: r["n"] for r in out} == {1: 2, 2: 1}
