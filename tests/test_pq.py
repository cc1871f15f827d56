"""Product-quantization gates (stages/pq.py): per-subspace codes must
equal independent kmeans_lattice runs on the column slices, qerr must
be their summed d2, and bad shapes must fail loudly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from duplicate_finder_ray.stages.kmeans import kmeans_lattice
from duplicate_finder_ray.stages.pq import pq_encode


def _emb_ds(n: int = 60, dim: int = 8, seed: int = 4) -> ray.data.Dataset:
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.ravel(), pa.float32()), dim
            ),
        }
    )
    return ray.data.from_arrow(tbl)


def test_pq_equals_per_subspace_kmeans(ray_session):
    n, dim, m, k = 60, 8, 2, 4
    ds = _emb_ds(n, dim)
    got = (
        pq_encode(ds, "vec_id", "embedding", dim=dim, m=m, k=k, iterations=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(got) == n
    qerr = np.zeros(n, dtype=np.int64)
    for j in range(m):
        lo, hi = j * dim // m, (j + 1) * dim // m

        def slice_batch(batch, lo=lo, hi=hi):
            col = batch.column("embedding").combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(len(col), -1)[:, lo:hi]
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat.ravel(), pa.float32()), hi - lo
                    ),
                }
            )

        ref = (
            kmeans_lattice(
                ds.map_batches(slice_batch, batch_format="pyarrow"),
                "vec_id",
                "embedding",
                k=k,
                iterations=2,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert got[f"code_{j}"].tolist() == ref["cluster"].tolist()
        qerr += ref["d2"].to_numpy(np.int64)
    assert got["qerr"].tolist() == qerr.tolist()


def test_pq_rejects_bad_dims(ray_session):
    ds = _emb_ds(10, 8)
    with pytest.raises(ValueError):
        pq_encode(ds, "vec_id", "embedding", dim=8, m=3, k=2)
    with pytest.raises(ValueError):
        pq_encode(ds, "vec_id", "embedding", dim=0, m=1, k=2)


def test_pq_empty_input(ray_session):
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    got = pq_encode(
        ray.data.from_arrow(empty), "vec_id", "embedding", dim=4, m=2, k=2
    ).to_pandas()
    assert len(got) == 0


def test_adc_own_vector_achieves_min(ray_session):
    """adc_d2(q, x) >= sum_j min_g LUT_j[g] = adc_d2(q, q), so the
    rank-1 distance of every query equals that query's own pq_encode
    qerr — ADC's defining identity on the lattice."""
    from duplicate_finder_ray.stages.pq import pq_adc_topk, pq_encode

    ds = _emb_ds(80, 8, seed=7)
    qids = [0, 3, 11]
    topk = 80
    got = (
        pq_adc_topk(
            ds, "vec_id", "embedding", dim=8, m=2, k=4,
            query_ids=qids, topk=topk,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    codes = pq_encode(ds, "vec_id", "embedding", dim=8, m=2, k=4).to_pandas()
    qerr = dict(zip(codes["vec_id"], codes["qerr"]))
    for q in qids:
        sub = got[got["query_id"] == q]
        assert len(sub) == topk
        assert sub["rank"].tolist() == list(range(1, topk + 1))
        d = sub["adc_d2"].to_numpy()
        assert (np.diff(d) >= 0).all()  # ranks follow distance
        assert d[0] == qerr[q]  # own-vector minimality
        own = sub[sub["vec_id"] == q]
        assert len(own) == 1 and int(own["adc_d2"].iloc[0]) == qerr[q]


def test_adc_rejects_missing_query(ray_session):
    from duplicate_finder_ray.stages.pq import pq_adc_topk

    ds = _emb_ds(10, 8)
    with pytest.raises(ValueError):
        pq_adc_topk(
            ds, "vec_id", "embedding", dim=8, m=2, k=2,
            query_ids=[999], topk=3,
        ).to_pandas()
    with pytest.raises(ValueError):
        pq_adc_topk(
            ds, "vec_id", "embedding", dim=8, m=2, k=2,
            query_ids=[0], topk=0,
        )
