"""E2E near-dup pipeline tests: LSH recall vs a brute-force Jaccard
oracle, verification modes, SimHash candidates, connected components."""

import numpy as np
import pandas as pd
import pytest

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.functions.shingles import Shingler, exact_jaccard
from duplicate_finder_ray.pipelines.neardup import NearDupPipeline
from duplicate_finder_ray.sources.code_table import synthetic_code_corpus
from duplicate_finder_ray.stages import cc, neardup


def brute_force_pairs(df: pd.DataFrame, cfg: PipelineConfig) -> set[tuple[str, str]]:
    """All unordered pairs with exact shingle Jaccard ≥ τ at the same
    shingle config — the reference-equivalent ground truth
    (SURVEY.md §5: 'brute-force Jaccard over shingle sets')."""
    sh = Shingler(k=cfg.shingle_k, mode=cfg.shingle_mode)
    fid = (df["repo"] + ":" + df["path"] + "@" + df["commit"]).tolist()
    sets = [sh.shingle_hashes(c) for c in df["content"]]
    truth = set()
    for i in range(len(df)):
        if len(sets[i]) == 0:
            continue
        for j in range(i + 1, len(df)):
            if len(sets[j]) == 0:
                continue
            if exact_jaccard(sets[i], sets[j]) >= cfg.jaccard_threshold:
                truth.add(tuple(sorted((fid[i], fid[j]))))
    return truth


@pytest.fixture(scope="module")
def corpus():
    return synthetic_code_corpus(300, seed=11)


@pytest.fixture(scope="module")
def corpus_ds(ray_session, corpus):
    return ray_session.data.from_pandas(corpus)


class TestNearDupPipeline:
    def test_recall_and_precision_exact_mode(self, corpus, corpus_ds):
        cfg = PipelineConfig(jaccard_threshold=0.8)
        res = NearDupPipeline(cfg).run_on(corpus_ds)
        got = set(
            map(tuple, np.sort(res.pairs.to_pandas()[["a", "b"]].to_numpy(), axis=1))
        )
        truth = brute_force_pairs(corpus, cfg)
        assert truth, "fixture must contain near-dup pairs"
        recall = len(truth & got) / len(truth)
        precision = len(truth & got) / max(1, len(got))
        assert recall >= 0.99, f"recall {recall}"
        assert precision == 1.0, f"precision {precision} (exact verify ⇒ no FPs)"

    def test_join_path_matches_broadcast_path(self, corpus, corpus_ds):
        base = PipelineConfig(jaccard_threshold=0.8)
        joiny = PipelineConfig(jaccard_threshold=0.8, broadcast_verify_limit=0)
        p1 = NearDupPipeline(base).run_on(corpus_ds).pairs.to_pandas()
        p2 = NearDupPipeline(joiny).run_on(corpus_ds).pairs.to_pandas()
        k1 = set(map(tuple, np.sort(p1[["a", "b"]].to_numpy(), axis=1)))
        k2 = set(map(tuple, np.sort(p2[["a", "b"]].to_numpy(), axis=1)))
        assert k1 == k2

    def test_prestarted_split_matches_inline_split(self, corpus, corpus_ds):
        """The overlapped (prestarted, unfiltered-split +
        endpoint-filtering-build) verify path must produce identical
        pairs and jaccard scores to the inline fused-probe split path.
        broadcast_verify_limit=0 forces the sharded path; the
        prestart flag selects which split feeds it."""
        on = PipelineConfig(
            jaccard_threshold=0.8,
            broadcast_verify_limit=0,
            verify_prestart_shards=True,
        )
        off = PipelineConfig(
            jaccard_threshold=0.8,
            broadcast_verify_limit=0,
            verify_prestart_shards=False,
        )
        p1 = NearDupPipeline(on).run_on(corpus_ds).pairs.to_pandas()
        p2 = NearDupPipeline(off).run_on(corpus_ds).pairs.to_pandas()
        k1 = {
            (*sorted((r.a, r.b)), round(r.jaccard, 9))
            for r in p1.itertuples()
        }
        k2 = {
            (*sorted((r.a, r.b)), round(r.jaccard, 9))
            for r in p2.itertuples()
        }
        assert k1 == k2 and len(k1) > 0

    def test_fused_explode_exchange_matches_band_rows_path(
        self, corpus, corpus_ds
    ):
        """candidate_pairs with sigs_source (explode fused into the
        exchange split tasks) must produce identical deduped candidate
        pairs to the band-rows path. band_exchange_broadcast_limit=0
        forces the exchange on both sides."""
        from duplicate_finder_ray.stages.derive import add_identity

        cfg = PipelineConfig(
            jaccard_threshold=0.8, band_exchange_broadcast_limit=0
        )
        with_id = corpus_ds.map_batches(add_identity, batch_format="pyarrow")
        sigs = neardup.signatures(
            with_id.select_columns(["file_id", "content"]), cfg
        ).materialize()
        bands = neardup.explode_bands(sigs, cfg)
        p1 = neardup.candidate_pairs(bands, cfg).to_pandas()
        p2 = neardup.candidate_pairs(
            bands, cfg, sigs_source=sigs
        ).to_pandas()
        k1 = {
            (min(r.a, r.b), max(r.a, r.b), r.n_bands, r.bucket_size)
            for r in p1.itertuples()
        }
        k2 = {
            (min(r.a, r.b), max(r.a, r.b), r.n_bands, r.bucket_size)
            for r in p2.itertuples()
        }
        assert k1 == k2 and len(k1) > 0

    def test_shuffle_pair_dedupe_matches_remote_task_path(self, corpus, corpus_ds):
        """The distributed (sort-shuffle) cross-band pair dedupe must
        produce the same pairs AND n_bands counts as the small-side
        remote-task lexsort path."""
        base = PipelineConfig(jaccard_threshold=0.8)
        shuffly = PipelineConfig(
            jaccard_threshold=0.8, pair_dedupe_broadcast_limit=0
        )
        p1 = NearDupPipeline(base).run_on(corpus_ds).pairs.to_pandas()
        p2 = NearDupPipeline(shuffly).run_on(corpus_ds).pairs.to_pandas()
        k1 = {
            (*sorted((r.a, r.b)), r.n_bands) for r in p1.itertuples()
        }
        k2 = {
            (*sorted((r.a, r.b)), r.n_bands) for r in p2.itertuples()
        }
        assert k1 == k2

    def test_fused_band_exchange_matches_shuffle_path(self, corpus, corpus_ds):
        """The fused single-task band exchange (bucketing + capped pair
        emission + cross-band dedupe in one lexsort) must produce the
        same pairs and n_bands as the two-level shuffle path."""
        fused = PipelineConfig(jaccard_threshold=0.8)  # default: fused
        shuffly = PipelineConfig(
            jaccard_threshold=0.8, band_exchange_broadcast_limit=0
        )
        p1 = NearDupPipeline(fused).run_on(corpus_ds).pairs.to_pandas()
        p2 = NearDupPipeline(shuffly).run_on(corpus_ds).pairs.to_pandas()
        k1 = {(*sorted((r.a, r.b)), r.n_bands) for r in p1.itertuples()}
        k2 = {(*sorted((r.a, r.b)), r.n_bands) for r in p2.itertuples()}
        assert k1 == k2

    def test_estimate_mode_high_recall_on_clear_pairs(self, corpus, corpus_ds):
        """Estimate mode is noisy at the boundary; on pairs with true
        J ≥ τ + 3σ it must agree with exact mode."""
        cfg_ex = PipelineConfig(jaccard_threshold=0.8)
        cfg_est = PipelineConfig(jaccard_threshold=0.8, verify_mode="estimate")
        exact_pairs = NearDupPipeline(cfg_ex).run_on(corpus_ds).pairs.to_pandas()
        est = NearDupPipeline(cfg_est).run_on(corpus_ds).pairs.to_pandas()
        est_keys = set(map(tuple, np.sort(est[["a", "b"]].to_numpy(), axis=1)))
        clear = exact_pairs[exact_pairs["jaccard"] >= 0.91]
        clear_keys = set(map(tuple, np.sort(clear[["a", "b"]].to_numpy(), axis=1)))
        missed = clear_keys - est_keys
        assert not missed, f"estimate mode missed clear pairs: {missed}"

    def test_exact_dups_are_near_dups(self, ray_session):
        df = pd.DataFrame(
            {
                "repo": ["o/a", "o/b", "o/c"],
                "path": ["f1.py", "f2.py", "g.py"],
                "commit": ["1" * 40, "2" * 40, "3" * 40],
                "lang": ["python"] * 3,
                "content": [
                    "def f(): return alpha beta gamma delta epsilon zeta",
                    "def f(): return alpha beta gamma delta epsilon zeta",
                    "completely different words entirely here now okay fine",
                ],
            }
        )
        cfg = PipelineConfig(jaccard_threshold=0.8)
        res = NearDupPipeline(cfg).run_on(ray_session.data.from_pandas(df))
        pairs = res.pairs.to_pandas()
        assert len(pairs) == 1
        assert pairs["jaccard"].iloc[0] == 1.0
        labels = res.labels.to_pandas()
        assert labels["component"].nunique() == 1
        assert len(labels) == 2  # the unrelated doc is not in the pair graph

    def test_signature_table_shape(self, corpus_ds):
        cfg = PipelineConfig()
        sigs = NearDupPipeline(cfg).signatures_for(corpus_ds).to_pandas()
        assert {"file_id", "minhash", "simhash", "n_shingles"} <= set(sigs.columns)
        assert all(len(m) == cfg.minhash_perms for m in sigs["minhash"][:5])


class TestBucketCap:
    def test_hot_bucket_capped_but_observable(self, ray_session):
        """A bucket above the cap emits at most cap members' pairs, and
        every emitted pair records the TRUE bucket size (no silent
        truncation)."""
        n = 30
        df = pd.DataFrame(
            {
                "repo": [f"o/r{i}" for i in range(n)],
                "path": [f"f{i}.py" for i in range(n)],
                "commit": [f"{i:040d}" for i in range(n)],
                "lang": ["python"] * n,
                "content": ["identical content words one two three four five"] * n,
            }
        )
        cfg = PipelineConfig(jaccard_threshold=0.8, band_bucket_cap=10)
        ds = ray_session.data.from_pandas(df)
        with_id = ds.map_batches(
            __import__(
                "duplicate_finder_ray.stages.derive", fromlist=["add_identity"]
            ).add_identity,
            batch_format="pyarrow",
        )
        sigs = neardup.signatures(
            with_id.select_columns(["file_id", "content"]), cfg
        )
        bands = neardup.explode_bands(sigs, cfg)
        pairs = neardup.candidate_pairs(bands, cfg).to_pandas()
        # cap=10 → 45 pairs max per bucket, not C(30,2)=435
        assert len(pairs) == 45
        assert (pairs["bucket_size"] == n).all()

    def test_derive_bucket_cap_budget(self):
        """Budget-derived cap: max m with Σ C(min(s, m), 2) ≤ budget."""
        import numpy as np

        sizes = np.array([100, 50, 3, 2, 1])
        # generous budget → cap = max bucket size (nothing truncated)
        assert neardup.derive_bucket_cap(sizes, 10_000_000) == 100
        # exact fit: C(100,2)+C(50,2)+C(3,2)+C(2,2)=4950+1225+3+1=6179
        assert neardup.derive_bucket_cap(sizes, 6179) == 100
        assert neardup.derive_bucket_cap(sizes, 6178) == 99
        # tight budget → small cap, never below 2
        assert neardup.derive_bucket_cap(sizes, 0) == 2
        assert neardup.derive_bucket_cap(np.array([], dtype=np.int64), 10) == 2
        # brute-force cross-check on a random size vector
        rng = np.random.default_rng(7)
        sz = rng.integers(1, 40, size=50)
        for budget in (10, 100, 1000, 5000):
            got = neardup.derive_bucket_cap(sz, budget)
            pairs_at = lambda m: int(
                sum(min(s, m) * (min(s, m) - 1) // 2 for s in sz)
            )
            assert pairs_at(got) <= budget or got == 2
            if got < sz.max():
                assert pairs_at(got + 1) > budget

    def test_overflow_warning_fires_when_binding(self):
        """A binding cap (fixed or budget-derived) must warn loudly;
        a non-binding one must stay silent."""
        import warnings as _w

        import numpy as np

        bh = np.repeat(np.uint64(12345), 20)
        ids = np.arange(20, dtype=np.uint64)
        with pytest.warns(RuntimeWarning, match="BINDING"):
            neardup.bucket_pairs_arrays(bh, ids, 5)
        # budget-derived cap that binds: 20-member bucket, budget 10
        with pytest.warns(RuntimeWarning, match="recall may drop"):
            a, b, sz = neardup.bucket_pairs_arrays(bh, ids, None, 10)
        assert (sz == 20).all()  # true size still recorded
        # budget-derived cap that does NOT bind: silence
        with _w.catch_warnings():
            _w.simplefilter("error")
            a, b, sz = neardup.bucket_pairs_arrays(bh, ids, None, 10_000)
        assert len(a) == 20 * 19 // 2  # complete — nothing truncated

    def test_default_config_truncates_nothing_at_gate_scale(
        self, ray_session
    ):
        """band_bucket_cap=None (default): a 30-member near-clique
        bucket emits ALL C(30,2) pairs — the old fixed default of 200
        is gone and the budget cap is non-binding here."""
        n = 30
        df = pd.DataFrame(
            {
                "repo": [f"o/r{i}" for i in range(n)],
                "path": [f"f{i}.py" for i in range(n)],
                "commit": [f"{i:040d}" for i in range(n)],
                "lang": ["python"] * n,
                "content": ["identical content words one two three four five"] * n,
            }
        )
        cfg = PipelineConfig(jaccard_threshold=0.8)
        assert cfg.band_bucket_cap is None
        ds = ray_session.data.from_pandas(df)
        with_id = ds.map_batches(
            __import__(
                "duplicate_finder_ray.stages.derive", fromlist=["add_identity"]
            ).add_identity,
            batch_format="pyarrow",
        )
        sigs = neardup.signatures(
            with_id.select_columns(["file_id", "content"]), cfg
        )
        bands = neardup.explode_bands(sigs, cfg)
        pairs = neardup.candidate_pairs(bands, cfg).to_pandas()
        assert len(pairs) == n * (n - 1) // 2
        assert (pairs["bucket_size"] == n).all()


class TestConnectedComponents:
    def test_chain_converges_to_one_component(self, ray_session):
        # path graph a-b-c-d-e: hash-to-min needs multiple rounds
        edges = pd.DataFrame(
            {"a": ["n1", "n2", "n3", "n4"], "b": ["n2", "n3", "n4", "n5"]}
        )
        cfg = PipelineConfig()
        labels = cc.connected_components(
            ray_session.data.from_pandas(edges), cfg
        ).to_pandas()
        assert labels["component"].nunique() == 1
        assert set(labels["file_id"]) == {"n1", "n2", "n3", "n4", "n5"}
        assert (labels["component"] == "n1").all()

    def test_two_components(self, ray_session):
        edges = pd.DataFrame({"a": ["x1", "x2", "y1"], "b": ["x2", "x3", "y2"]})
        cfg = PipelineConfig()
        labels = cc.connected_components(
            ray_session.data.from_pandas(edges), cfg
        ).to_pandas()
        comp = dict(zip(labels["file_id"], labels["component"]))
        assert comp["x1"] == comp["x2"] == comp["x3"] == "x1"
        assert comp["y1"] == comp["y2"] == "y1"

    def test_matches_networkx_free_oracle(self, ray_session):
        # random graph vs a simple driver-side union-find oracle
        rng = np.random.default_rng(9)
        n_nodes, n_edges = 60, 50
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        mask = a != b
        edges = pd.DataFrame(
            {"a": [f"v{int(x):03d}" for x in a[mask]], "b": [f"v{int(x):03d}" for x in b[mask]]}
        )
        parent: dict[str, str] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for _, r in edges.iterrows():
            ra, rb = find(r["a"]), find(r["b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        oracle = {v: find(v) for v in parent}

        cfg = PipelineConfig()
        labels = cc.connected_components(
            ray_session.data.from_pandas(edges), cfg
        ).to_pandas()
        got = dict(zip(labels["file_id"], labels["component"]))
        assert got == oracle

        # same graph through the ITERATIVE multi-bucket path (the
        # >threshold scale shape; small inputs default to the one-task
        # fast path)
        cfg_iter = PipelineConfig(cc_local_threshold=0)
        labels_iter = cc.connected_components(
            ray_session.data.from_pandas(edges), cfg_iter
        ).to_pandas()
        got_iter = dict(zip(labels_iter["file_id"], labels_iter["component"]))
        assert got_iter == oracle

    def test_iterative_chain(self, ray_session):
        edges = pd.DataFrame(
            {"a": [f"n{i}" for i in range(1, 30)], "b": [f"n{i+1}" for i in range(1, 30)]}
        )
        cfg = PipelineConfig(cc_local_threshold=0)
        labels = cc.connected_components(
            ray_session.data.from_pandas(edges), cfg
        ).to_pandas()
        assert labels["component"].nunique() == 1
        assert (labels["component"] == "n1").all()

    def test_iterative_mega_component_hub_skew(self, ray_session):
        """North_rule skew stress: one giant star component (a hub node
        incident to every edge — the worst per-bucket concentration the
        hash-to-min exchange can see) plus a long chain, through the
        ITERATIVE path. The hub's complete incident set lands in one
        bucket every round; the per-bucket kernel must stay vectorized
        (seconds, not minutes) and exact."""
        n = 50_000
        star = pd.DataFrame(
            {"a": ["a_hub"] * n, "b": [f"n{i:06d}" for i in range(n)]}
        )
        chain = pd.DataFrame(
            {
                "a": [f"z{i:04d}" for i in range(400)],
                "b": [f"z{i + 1:04d}" for i in range(400)],
            }
        )
        edges = pd.concat([star, chain], ignore_index=True)
        cfg = PipelineConfig(cc_local_threshold=0)
        labels = cc.connected_components(
            ray_session.data.from_pandas(edges), cfg
        ).to_pandas()
        got = dict(zip(labels["file_id"], labels["component"]))
        assert len(got) == n + 1 + 401
        star_nodes = ["a_hub"] + [f"n{i:06d}" for i in range(n)]
        assert all(got[x] == "a_hub" for x in star_nodes)
        assert all(got[f"z{i:04d}"] == "z0000" for i in range(401))

    def test_iterative_round_metrics_expose_bucket_bound(self, ray_session):
        """The documented O(max-component) per-bucket bound must be
        OBSERVABLE: the iterative path appends one metric row per
        contraction round; max_bucket_rows tracks the giant component's
        star size so a runaway component is visible before it OOMs."""
        n = 5_000
        star = pd.DataFrame(
            {"a": ["a_hub"] * n, "b": [f"n{i:06d}" for i in range(n)]}
        )
        cfg = PipelineConfig(cc_local_threshold=0)
        rounds: list[dict] = []
        labels = cc.connected_components(
            ray_session.data.from_pandas(star), cfg, round_metrics=rounds
        ).to_pandas()
        assert len(labels) == n + 1
        assert len(rounds) >= 1  # one row per round, including fixpoint
        for i, r in enumerate(rounds):
            assert r["round"] == i
            assert set(r) == {
                "round",
                "num_buckets",
                "max_bucket_rows",
                "total_star_rows",
            }
        # at the fixpoint the hub's bucket holds the whole component's
        # star: the metric must show the concentration, not average it
        assert rounds[-1]["max_bucket_rows"] >= n + 1
        assert rounds[-1]["total_star_rows"] >= n + 1

    def test_round_metrics_in_checkpoint_lineage(self, ray_session, tmp_path):
        """run_checkpointed persists the per-round CC bucket loads into
        the labels stage's lineage manifest."""
        from duplicate_finder_ray.pipelines.neardup import NearDupPipeline

        df = pd.DataFrame(
            {
                "repo": ["o/r"] * 4,
                "path": [f"f{i}.py" for i in range(4)],
                "commit": ["1" * 40] * 4,
                "lang": ["python"] * 4,
                "content": ["alpha beta gamma delta epsilon zeta" * 3] * 4,
            }
        )
        cfg = PipelineConfig(cc_local_threshold=0, jaccard_threshold=0.5)
        res = NearDupPipeline(cfg).run_checkpointed(
            ray_session.data.from_pandas(df), str(tmp_path / "ckpt")
        )
        by_stage = {m["stage"]: m for m in res.metrics["checkpoints"]}
        assert "cc_rounds" in by_stage["labels"]
        assert by_stage["labels"]["cc_rounds"] == res.metrics["cc_rounds"]
        assert len(res.metrics["cc_rounds"]) >= 1


class TestSimHashPairs:
    def test_identical_zero_hamming(self, ray_session):
        df = pd.DataFrame(
            {
                "repo": ["o/a", "o/b"],
                "path": ["f1.py", "f2.py"],
                "commit": ["1" * 40, "2" * 40],
                "lang": ["python"] * 2,
                "content": ["alpha beta gamma delta epsilon zeta eta theta"] * 2,
            }
        )
        cfg = PipelineConfig()
        ds = ray_session.data.from_pandas(df)
        sigs = NearDupPipeline(cfg).signatures_for(ds)
        pairs = neardup.simhash_candidate_pairs(sigs, cfg, max_hamming=3).to_pandas()
        assert len(pairs) == 1
        assert pairs["hamming"].iloc[0] == 0
