"""IVF-PQ gates (stages/ivfpq.py): in the exactness limit (every cell
probed, every residual its own codebook entry, zero Lloyd updates) the
ADC distance IS the exact lattice distance, so top-k must equal
brute force; plus pruning and validation behavior."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from duplicate_finder_ray.stages.ivfpq import ivfpq_adc_topk


def _emb_ds(n: int = 40, dim: int = 8, seed: int = 6):
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
    return ray.data.from_arrow(tbl), mat


def test_exactness_limit_equals_brute_force(ray_session):
    n, dim = 40, 8
    ds, mat = _emb_ds(n, dim)
    qids = [0, 5]
    got = (
        ivfpq_adc_topk(
            ds, "vec_id", "embedding", dim=dim, m=2, k_coarse=4, k_sub=n,
            query_ids=qids, topk=n, nprobe=4, iterations=0,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    q = np.floor(mat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    for qid in qids:
        d2 = ((q[qid][None, :] - q) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(n), d2))
        sub = got[got["query_id"] == qid]
        assert sub["vec_id"].tolist() == list(order)
        assert sub["adc_d2"].tolist() == d2[order].tolist()


def test_pruning_restricts_candidates(ray_session):
    ds, _ = _emb_ds(60, 8)
    full = ivfpq_adc_topk(
        ds, "vec_id", "embedding", dim=8, m=2, k_coarse=6, k_sub=8,
        query_ids=[0], topk=60, nprobe=6,
    ).to_pandas()
    pruned = ivfpq_adc_topk(
        ds, "vec_id", "embedding", dim=8, m=2, k_coarse=6, k_sub=8,
        query_ids=[0], topk=60, nprobe=1,
    ).to_pandas()
    # probing fewer cells can only shrink the candidate set, and every
    # pruned result must appear in the full scan with the same distance
    assert len(pruned) < len(full)
    fd = dict(zip(full["vec_id"], full["adc_d2"]))
    assert all(fd[v] == d for v, d in zip(pruned["vec_id"], pruned["adc_d2"]))


def test_rejects_bad_params(ray_session):
    ds, _ = _emb_ds(10, 8)
    with pytest.raises(ValueError):
        ivfpq_adc_topk(ds, "vec_id", "embedding", dim=8, m=3, k_coarse=2,
                       k_sub=2, query_ids=[0], topk=3, nprobe=1)
    with pytest.raises(ValueError):
        ivfpq_adc_topk(ds, "vec_id", "embedding", dim=8, m=2, k_coarse=2,
                       k_sub=2, query_ids=[0], topk=0, nprobe=1)
    with pytest.raises(ValueError):
        ivfpq_adc_topk(ds, "vec_id", "embedding", dim=8, m=2, k_coarse=2,
                       k_sub=2, query_ids=[999], topk=3, nprobe=1)
