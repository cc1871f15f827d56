"""Unit tests for the grouped-statistics and window/agg extensions:
moment-sum z-score outliers, Pearson correlation, MODE, CUBE, weighted
sampling, RANK/DENSE_RANK, ordered STRING_AGG and FIRST/LAST_VALUE —
semantics the driver gate doesn't isolate (tie-breaks, degenerate
groups, parallelism invariance, DuckDB twin equality on adversarial
inputs)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from duplicate_finder_ray.stages.events import event_sequences, user_first_last
from duplicate_finder_ray.stages.relational import (
    grouped_cube,
    grouped_mode,
    rank_dense_per_group,
    weighted_sample,
)
from duplicate_finder_ray.stages.stats import grouped_corr, grouped_zscore_outliers


def _docs(ids, langs, vals):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "n_chars": pa.array(vals, pa.int64()),
            }
        )
    )


class TestZscoreOutliers:
    def test_matches_numpy_reference(self, ray_session):
        rng = np.random.default_rng(7)
        langs = np.repeat(["en", "de", "fr"], 50)
        vals = rng.integers(10, 5000, size=150)
        ds = _docs(list(range(150)), list(langs), vals.tolist())
        out = grouped_zscore_outliers(
            ds, "lang", "n_chars", ["doc_id", "lang", "n_chars"], 1.5
        ).to_pandas()

        df = pd.DataFrame({"doc_id": range(150), "lang": langs, "v": vals})
        expect = set()
        for lang, g in df.groupby("lang"):
            m = g["v"].mean()
            sd = g["v"].std(ddof=1)
            expect |= set(g.loc[np.abs((g["v"] - m) / sd) >= 1.5, "doc_id"])
        assert set(out["doc_id"]) == expect

    def test_degenerate_groups_emit_nothing(self, ray_session):
        # n=1 group and zero-variance group are excluded on both engines
        ds = _docs([1, 2, 3, 4], ["a", "b", "b", "b"], [100, 5, 5, 5])
        out = grouped_zscore_outliers(
            ds, "lang", "n_chars", ["doc_id"], 0.0
        ).to_pandas()
        assert len(out) == 0

    def test_z_micro_matches_duckdb_expression(self, ray_session):
        ids = list(range(20))
        vals = [3, 1000, 17, 968, 4, 5, 81, 995, 2, 7,
                11, 990, 23, 970, 6, 9, 985, 12, 8, 999]
        ds = _docs(ids, ["x"] * 20, vals)
        out = (
            grouped_zscore_outliers(ds, "lang", "n_chars", ["doc_id"], 0.5)
            .to_pandas()
            .sort_values("doc_id")
        )
        con = duckdb.connect()
        df = pd.DataFrame({"doc_id": ids, "lang": ["x"] * 20, "n_chars": vals})
        con.register("df", df)
        want = con.execute(
            """
            WITH s AS (SELECT lang, CAST(count(*) AS BIGINT) n,
                              CAST(sum(n_chars*n_chars) AS BIGINT) sxx,
                              CAST(sum(n_chars) AS BIGINT) sx
                       FROM df GROUP BY lang),
            p AS (SELECT lang, CAST(sx AS DOUBLE)/n AS m,
                         sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                               * (CAST(sx AS DOUBLE)/n)) / (n-1)) AS sd
                  FROM s WHERE n > 1)
            SELECT doc_id,
                   CAST(floor((n_chars - m)/sd * 1000000 + 0.5) AS BIGINT)
                     AS z_micro
            FROM df JOIN p USING (lang)
            WHERE sd > 0 AND abs((n_chars - m)/sd) >= 0.5
            ORDER BY doc_id
            """
        ).df()
        got = out[["doc_id", "z_micro"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestGroupedCorr:
    def test_matches_numpy_pearson(self, ray_session):
        rng = np.random.default_rng(11)
        x = rng.integers(1, 1000, 200)
        y = (x * 3 + rng.integers(-50, 50, 200)).astype(np.int64)
        langs = np.where(np.arange(200) % 2 == 0, "en", "de")
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "lang": pa.array(langs.tolist(), pa.string()),
                    "x": pa.array(x, pa.int64()),
                    "y": pa.array(y, pa.int64()),
                }
            )
        )
        out = grouped_corr(ds, "lang", "x", "y").to_pandas()
        for lang in ("en", "de"):
            m = langs == lang
            r = np.corrcoef(x[m], y[m])[0, 1]
            got = out.loc[out["lang"] == lang, "corr_micro"].iloc[0]
            assert abs(got / 1e6 - r) < 2e-6

    def test_zero_variance_group_is_zero(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "lang": pa.array(["c"] * 4, pa.string()),
                    "x": pa.array([5, 5, 5, 5], pa.int64()),
                    "y": pa.array([1, 2, 3, 4], pa.int64()),
                }
            )
        )
        out = grouped_corr(ds, "lang", "x", "y").to_pandas()
        assert out["corr_micro"].tolist() == [0]
        assert out["n_rows"].tolist() == [4]


class TestGroupedModeCube:
    def test_mode_tie_breaks_lexicographically(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                    "v": pa.array(["b", "b", "a", "a", "z", "z"], pa.string()),
                }
            )
        )
        out = grouped_mode(ds, "k", "v").to_pandas().sort_values("k")
        assert out["v"].tolist() == ["a", "z"]
        assert out["n"].tolist() == [2, 2]

    def test_cube_matches_duckdb(self, ray_session):
        rng = np.random.default_rng(3)
        lang = rng.choice(["en", "de"], 100).tolist()
        src = rng.choice(["web", "book", "code"], 100).tolist()
        n = rng.integers(1, 100, 100)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "lang": pa.array(lang, pa.string()),
                    "source": pa.array(src, pa.string()),
                    "n_chars": pa.array(n, pa.int64()),
                }
            )
        )
        got = (
            grouped_cube(ds, ["lang", "source"], "n_chars")
            .to_pandas()
            .sort_values(["lang", "source"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"lang": lang, "source": src, "n_chars": n}))
        want = con.execute(
            """
            SELECT coalesce(lang,'ALL') lang, coalesce(source,'ALL') source,
                   CAST(count(*) AS BIGINT) n_rows,
                   CAST(sum(n_chars) AS BIGINT) sum_n_chars
            FROM t GROUP BY CUBE(lang, source)
            ORDER BY lang, source
            """
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestWeightedSample:
    def test_extreme_weights(self, ray_session):
        ds = _docs(list(range(100)), ["x"] * 100, [1] * 100)

        def wq_const(v):
            def add(b):
                return b.append_column(
                    "wq", pa.array(np.full(len(b), v, dtype=np.int64))
                )
            return add

        none = weighted_sample(
            ds.map_batches(wq_const(0), batch_format="pyarrow"), "doc_id", "wq"
        )
        allr = weighted_sample(
            ds.map_batches(wq_const(65536), batch_format="pyarrow"), "doc_id", "wq"
        )
        assert none.count() == 0
        assert allr.count() == 100

    def test_matches_md5_predicate(self, ray_session):
        import hashlib

        ids = list(range(300))
        wq = [(min(7 * i % 2500, 2000) * 65536) // 2000 for i in ids]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "wq": pa.array(wq, pa.int64()),
                }
            )
        )
        got = set(weighted_sample(ds, "doc_id", "wq").to_pandas()["doc_id"])
        expect = {
            i
            for i, w in zip(ids, wq)
            if int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) < w
        }
        assert got == expect


class TestRankDense:
    def test_matches_duckdb_rank(self, ray_session):
        rng = np.random.default_rng(5)
        ids = list(range(120))
        langs = rng.choice(["a", "b", "c"], 120).tolist()
        vals = rng.integers(0, 10, 120)  # many ties
        ds = _docs(ids, langs, vals)
        got = (
            rank_dense_per_group(ds, "lang", "n_chars", descending=True)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register(
            "t", pd.DataFrame({"doc_id": ids, "lang": langs, "n_chars": vals})
        )
        want = con.execute(
            """
            SELECT doc_id, lang, n_chars,
                   CAST(rank() OVER w AS BIGINT) rnk,
                   CAST(dense_rank() OVER w AS BIGINT) drnk
            FROM t WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC)
            ORDER BY doc_id
            """
        ).df()
        pd.testing.assert_frame_equal(
            got[["doc_id", "rnk", "drnk"]],
            want[["doc_id", "rnk", "drnk"]],
            check_dtype=False,
        )

    def test_parallelism_invariance(self, ray_session):
        ids = list(range(60))
        vals = [i % 7 for i in ids]
        ds = _docs(ids, ["g"] * 60, vals)
        a = rank_dense_per_group(ds, "lang", "n_chars", num_partitions=1)
        b = rank_dense_per_group(ds, "lang", "n_chars", num_partitions=13)
        pa_ = a.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pb = b.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(pa_, pb)


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


class TestSequencesFirstLast:
    ROWS = [
        (1, 5000, 7, "view"),
        (2, 1000, 7, "signup"),
        (3, 3000, 7, "click"),
        (4, 2000, 8, "purchase"),
        (5, 9000, 8, "error"),
        (6, 2000, 9, "view"),
    ]

    def test_sequences_ordered_by_time(self, ray_session):
        out = {
            r["user_id"]: r for r in event_sequences(_events(self.ROWS)).take_all()
        }
        assert out[7]["seq"] == "signup,click,view"
        assert out[7]["n_events"] == 3
        assert out[8]["seq"] == "purchase,error"
        assert out[9]["seq"] == "view"

    def test_sequence_tie_on_ts_breaks_by_event_id(self, ray_session):
        rows = [(2, 100, 1, "b"), (1, 100, 1, "a")]
        out = event_sequences(_events(rows)).take_all()
        assert out[0]["seq"] == "a,b"

    def test_first_last(self, ray_session):
        out = {
            r["user_id"]: r for r in user_first_last(_events(self.ROWS)).take_all()
        }
        assert (out[7]["first_event"], out[7]["last_event"]) == ("signup", "view")
        assert (out[7]["first_ts_us"], out[7]["last_ts_us"]) == (1000, 5000)
        assert (out[8]["first_event"], out[8]["last_event"]) == ("purchase", "error")
        assert (out[9]["first_event"], out[9]["last_event"]) == ("view", "view")

    def test_first_last_combiner_across_blocks(self, ray_session):
        # force many blocks so the per-batch boundary combiner and the
        # final exchange both do real work
        rows = [(i, (i * 37) % 1000, i % 5, f"t{i % 3}") for i in range(200)]
        ds = _events(rows).repartition(16)
        got = {
            r["user_id"]: r for r in user_first_last(ds, num_partitions=7).take_all()
        }
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
        df = df.sort_values(["user_id", "ts", "event_id"])
        for uid, g in df.groupby("user_id"):
            assert got[uid]["first_event"] == g["event_type"].iloc[0]
            assert got[uid]["last_event"] == g["event_type"].iloc[-1]


class TestGroupedVectorMean:
    def test_matches_numpy_with_negatives(self, ray_session):
        from duplicate_finder_ray.stages.stats import grouped_vector_mean

        rng = np.random.default_rng(13)
        n, d = 120, 8
        vecs = (rng.standard_normal((n, d)) * 3).astype(np.float32)
        labels = rng.integers(0, 4, n).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "label": pa.array(labels, pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs], pa.list_(pa.float32())
                    ),
                }
            )
        ).repartition(7)
        out = grouped_vector_mean(ds, "label", "embedding").to_pandas()
        q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        for lab in np.unique(labels):
            m = labels == lab
            s = q[m].sum(axis=0)
            cnt = int(m.sum())
            want = np.where(s >= 0, s // cnt, -((-s) // cnt))
            got = (
                out[out["label"] == lab]
                .sort_values("dim")["mean_micro"]
                .to_numpy()
            )
            assert (got == want).all()
            assert (out[out["label"] == lab]["n_vecs"] == cnt).all()


class TestWindowedDistinct:
    def test_keeps_first_per_user_type_window(self, ray_session):
        from duplicate_finder_ray.stages.events import windowed_distinct

        H = 3_600_000_000
        rows = [
            # user 1, same type, same hour: only earliest kept
            (10, 100, 1, "click"),
            (11, 50, 1, "click"),
            (12, 200, 1, "click"),
            # same user+hour, different type: kept
            (13, 60, 1, "view"),
            # same user+type, NEXT hour: kept
            (14, H + 5, 1, "click"),
            # other user, same type+hour: kept
            (15, 70, 2, "click"),
        ]
        ds = _events_typed(rows)
        got = {r["event_id"] for r in windowed_distinct(ds).take_all()}
        assert got == {11, 13, 14, 15}

    def test_parallelism_invariance(self, ray_session):
        from duplicate_finder_ray.stages.events import windowed_distinct

        rows = [(i, (i * 997) % 7_200_000_000, i % 3, f"t{i % 2}")
                for i in range(300)]
        a = windowed_distinct(_events_typed(rows), num_partitions=1).take_all()
        b = windowed_distinct(
            _events_typed(rows).repartition(11), num_partitions=9
        ).take_all()
        assert {r["event_id"] for r in a} == {r["event_id"] for r in b}


def _events_typed(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


class TestNearestCentroidAssign:
    def test_matches_numpy_and_breaks_ties_to_smaller_label(self, ray_session):
        from duplicate_finder_ray.stages.stats import (
            grouped_vector_mean,
            nearest_centroid_assign,
        )

        rng = np.random.default_rng(29)
        n, d, g = 150, 6, 4
        # well-separated clusters + noise so most assignments are clear
        centers = rng.standard_normal((g, d)) * 5
        labels = rng.integers(0, g, n).astype(np.int64)
        vecs = (centers[labels] + rng.standard_normal((n, d)) * 0.3).astype(
            np.float32
        )
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "label": pa.array(labels, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(5)
        cents = grouped_vector_mean(
            ds.select_columns(["label", "embedding"]), "label", "embedding"
        )
        got = (
            nearest_centroid_assign(ds, "vec_id", "embedding", cents)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

        # numpy twin: identical lattice quantization + trunc-div centroids
        q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        cent = np.zeros((g, d), dtype=np.int64)
        for lab in range(g):
            s = q[labels == lab].sum(axis=0)
            cnt = int((labels == lab).sum())
            cent[lab] = np.where(s >= 0, s // cnt, -((-s) // cnt))
        diff = q[:, None, :] - cent[None, :, :]
        d2 = np.einsum("bgd,bgd->bg", diff, diff)
        best = np.argmin(d2, axis=1)  # first max = smallest label on ties
        assert (got["label"].to_numpy() == best).all()
        assert (
            got["d2"].to_numpy() == d2[np.arange(n), best]
        ).all()
        # clusters are separated: assignment recovers the true labels
        assert (best == labels).mean() > 0.95
