"""Unit tests for shingling / MinHash / SimHash primitives."""

import numpy as np
import pytest

from duplicate_finder_ray.functions.shingles import (
    Shingler,
    band_keys,
    estimated_jaccard,
    exact_jaccard,
    hamming64,
    minhash_params,
    minhash_signature,
    simhash64,
    simhash_band_keys,
    token_id,
)


class TestShingler:
    def test_deterministic(self):
        a = Shingler(k=3).shingle_hashes("the quick brown fox jumps")
        b = Shingler(k=3).shingle_hashes("the quick brown fox jumps")
        np.testing.assert_array_equal(a, b)

    def test_count(self):
        # n tokens, k=3 → n-k+1 shingles (all distinct here)
        sh = Shingler(k=3).shingle_hashes("a b c d e f")
        assert len(sh) == 4

    def test_short_doc_empty(self):
        assert len(Shingler(k=5).shingle_hashes("one two")) == 0
        assert len(Shingler(k=5).shingle_hashes("")) == 0

    def test_order_sensitivity(self):
        a = Shingler(k=2).shingle_hashes("x y z")
        b = Shingler(k=2).shingle_hashes("z y x")
        assert set(a.tolist()) != set(b.tolist())

    def test_modes(self):
        line = Shingler(k=2, mode="line")
        assert len(line.shingle_hashes("a\nb\nc\n")) == 2
        char = Shingler(k=4, mode="char")
        assert len(char.shingle_hashes("abcde")) == 2
        with pytest.raises(ValueError):
            Shingler(mode="bogus")

    def test_vocab_cache_consistency(self):
        sh = Shingler(k=2)
        first = sh.shingle_hashes("alpha beta gamma")
        again = sh.shingle_hashes("alpha beta gamma")
        np.testing.assert_array_equal(first, again)
        assert token_id("alpha") == sh._vocab["alpha"]


class TestMinHash:
    def test_identical_sets_identical_sigs(self):
        a, b = minhash_params(64, seed=1)
        s = Shingler(k=3).shingle_hashes("one two three four five six")
        np.testing.assert_array_equal(
            minhash_signature(s, a, b), minhash_signature(s.copy(), a, b)
        )

    def test_estimator_tracks_true_jaccard(self):
        rng = np.random.default_rng(0)
        base = rng.integers(0, 2**63, 1000, dtype=np.uint64)
        # overlap 80%: replace 200 elements
        other = base.copy()
        other[:200] = rng.integers(0, 2**63, 200, dtype=np.uint64)
        sa = np.unique(base)
        sb = np.unique(other)
        true_j = exact_jaccard(sa, sb)
        a, b = minhash_params(256, seed=3)
        est = estimated_jaccard(
            minhash_signature(sa, a, b), minhash_signature(sb, a, b)
        )
        assert abs(est - true_j) < 0.1

    def test_empty_set_sentinel(self):
        a, b = minhash_params(16, seed=0)
        sig = minhash_signature(np.empty(0, dtype=np.uint64), a, b)
        assert (sig == np.uint64(0xFFFFFFFFFFFFFFFF)).all()

    def test_seed_changes_sigs(self):
        s = Shingler(k=2).shingle_hashes("p q r s t")
        a1, b1 = minhash_params(32, seed=1)
        a2, b2 = minhash_params(32, seed=2)
        assert not np.array_equal(
            minhash_signature(s, a1, b1), minhash_signature(s, a2, b2)
        )


class TestSimHash:
    def test_identical(self):
        s = Shingler(k=2).shingle_hashes("m n o p q")
        assert simhash64(s) == simhash64(s.copy())

    def test_similar_docs_close_different_docs_far(self):
        sh = Shingler(k=3)
        base = "def compute total for item in values return total " * 10
        near = base.replace("item", "entry", 1)
        far = "completely unrelated words about seventeen ducks on a pond " * 10
        f_base = np.array([simhash64(sh.shingle_hashes(base))], dtype=np.uint64)
        f_near = np.array([simhash64(sh.shingle_hashes(near))], dtype=np.uint64)
        f_far = np.array([simhash64(sh.shingle_hashes(far))], dtype=np.uint64)
        assert hamming64(f_base, f_near)[0] < hamming64(f_base, f_far)[0]

    def test_empty_zero(self):
        assert simhash64(np.empty(0, dtype=np.uint64)) == 0


class TestBanding:
    def test_band_keys_shape_and_determinism(self):
        rng = np.random.default_rng(5)
        sigs = rng.integers(0, 2**63, (10, 128), dtype=np.uint64)
        k1 = band_keys(sigs, 32)
        k2 = band_keys(sigs.copy(), 32)
        assert k1.shape == (10, 32)
        np.testing.assert_array_equal(k1, k2)

    def test_identical_band_block_same_key(self):
        rng = np.random.default_rng(6)
        s1 = rng.integers(0, 2**63, (1, 128), dtype=np.uint64)
        s2 = s1.copy()
        s2[0, 4:] = rng.integers(0, 2**63, 124, dtype=np.uint64)
        k1, k2 = band_keys(s1, 32)[0], band_keys(s2, 32)[0]
        assert k1[0] == k2[0]           # first band (rows 0-3) identical
        assert (k1[1:] != k2[1:]).any()  # later bands differ

    def test_same_rows_different_band_differ(self):
        # identical row-block content in different band positions must
        # not collide (band index folded into the key)
        sigs = np.tile(
            np.arange(4, dtype=np.uint64), (1, 32)
        ).reshape(1, 128)
        keys = band_keys(sigs, 32)[0]
        assert len(np.unique(keys)) == 32

    def test_simhash_blocks(self):
        fps = np.array([0x0123456789ABCDEF], dtype=np.uint64)
        blocks = simhash_band_keys(fps, 4)[0]
        assert blocks.tolist() == [0xCDEF, 0x89AB, 0x4567, 0x0123]


class TestBatchKernels:
    """The CSR batch kernels must be bit-identical to the per-doc
    functions — SignatureStage routes every signature through them."""

    def test_batch_matches_per_doc_all_modes(self):
        from duplicate_finder_ray.functions.shingles import (
            Shingler,
            batch_minhash,
            batch_simhash,
            minhash_params,
            minhash_signature,
            simhash64,
        )

        rng = np.random.default_rng(5)
        words = ["foo", "bar", "baz", "qux", "if", "ret", "x", "y1", "z"]
        a, b = minhash_params(64, 7)
        work = {}
        for mode in ("token", "line", "char"):
            for trial in range(15):
                texts = []
                for _ in range(rng.integers(1, 25)):
                    nw = rng.integers(0, 40)
                    sep = "\n" if rng.random() < 0.3 else " "
                    texts.append(sep.join(rng.choice(words, size=nw).tolist()))
                if trial % 7 == 0:
                    texts[0] = ""  # empty doc
                if trial % 5 == 0:
                    texts.append(None)  # null content
                sh = Shingler(k=3, mode=mode)
                flat, offs = sh.shingle_hashes_batch(texts)
                sigs = batch_minhash(flat, offs, a, b, work=work)
                sims = batch_simhash(flat, offs, work=work)
                ref_sh = Shingler(k=3, mode=mode)
                for i, t in enumerate(texts):
                    ref = ref_sh.shingle_hashes(t if t is not None else "")
                    np.testing.assert_array_equal(ref, flat[offs[i]:offs[i+1]])
                    np.testing.assert_array_equal(
                        minhash_signature(ref, a, b), sigs[i]
                    )
                    assert simhash64(ref) == int(sims[i])

    def test_batch_all_empty_docs(self):
        from duplicate_finder_ray.functions.shingles import (
            Shingler,
            batch_minhash,
            batch_simhash,
            minhash_params,
        )

        a, b = minhash_params(16, 3)
        flat, offs = Shingler(k=5).shingle_hashes_batch(["", "a b", None])
        assert len(flat) == 0 and offs.tolist() == [0, 0, 0, 0]
        sigs = batch_minhash(flat, offs, a, b)
        assert (sigs == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        assert batch_simhash(flat, offs).tolist() == [0, 0, 0]

    def test_batch_spans_row_blocks(self):
        # one doc larger than _ROW_BLOCK shingles: the blocked kernels
        # must min/vote-merge across block boundaries
        from duplicate_finder_ray.functions.shingles import (
            _ROW_BLOCK,
            Shingler,
            batch_minhash,
            batch_simhash,
            minhash_params,
            minhash_signature,
            simhash64,
        )

        rng = np.random.default_rng(11)
        big = " ".join(
            f"t{v}" for v in rng.integers(0, 1 << 30, size=_ROW_BLOCK + 500)
        )
        texts = ["small doc one two three four five", big]
        sh = Shingler(k=3)
        flat, offs = sh.shingle_hashes_batch(texts)
        assert offs[2] - offs[1] > _ROW_BLOCK
        a, b = minhash_params(32, 9)
        sigs = batch_minhash(flat, offs, a, b)
        sims = batch_simhash(flat, offs)
        ref_sh = Shingler(k=3)
        for i, t in enumerate(texts):
            ref = ref_sh.shingle_hashes(t)
            np.testing.assert_array_equal(minhash_signature(ref, a, b), sigs[i])
            assert simhash64(ref) == int(sims[i])


class TestBatchKernelProperty:
    def test_batch_equals_per_doc_on_random_texts(self):
        """Hypothesis: the whole-batch CSR kernels (shingle_hashes_batch
        → batch_minhash/batch_simhash) are bit-identical to the per-doc
        reference functions on arbitrary unicode texts, all modes."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from duplicate_finder_ray.functions.shingles import (
            batch_minhash,
            batch_simhash,
        )

        a, b = minhash_params(32, seed=7)

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(
                st.text(
                    st.characters(codec="utf-8"),
                    min_size=0,
                    max_size=80,
                ),
                min_size=1,
                max_size=6,
            ),
            st.sampled_from(["token", "char", "line"]),
            st.sampled_from([2, 3, 5]),
        )
        def check(texts, mode, k):
            sh = Shingler(k=k, mode=mode)
            flat, offs = sh.shingle_hashes_batch(texts)
            sigs = batch_minhash(flat, offs, a, b)
            sims = batch_simhash(flat, offs)
            for i, t in enumerate(texts):
                hs = sh.shingle_hashes(t)
                np.testing.assert_array_equal(
                    np.sort(np.unique(hs)), np.sort(flat[offs[i] : offs[i + 1]])
                )
                np.testing.assert_array_equal(
                    sigs[i], minhash_signature(np.unique(hs), a, b)
                )
                assert sims[i] == simhash64(np.unique(hs))

        check()


class TestColumnTokenizePath:
    def test_column_equals_list_path(self):
        import pyarrow as pa

        from duplicate_finder_ray.functions.shingles import Shingler

        ascii_texts = ["a b c d e f g", "x_1 y2 z! a b c d", "", None, "short"]
        uni_texts = ["héllo wörld a b c d é", "中文 分词 a b c d e", "a b c d e"]
        for texts in (ascii_texts, uni_texts, ascii_texts + uni_texts):
            col = pa.array(texts, pa.string())
            s1, s2 = Shingler(k=3), Shingler(k=3)
            f1, o1 = s1.shingle_hashes_batch_column(col)
            f2, o2 = s2.shingle_hashes_batch(texts)
            np.testing.assert_array_equal(o1, o2)
            np.testing.assert_array_equal(f1, f2)

    def test_column_property_random_unicode(self):
        import pyarrow as pa

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from duplicate_finder_ray.functions.shingles import Shingler

        @settings(max_examples=50, deadline=None)
        @given(
            st.lists(
                st.text(st.characters(codec="utf-8"), max_size=60),
                min_size=1,
                max_size=5,
            )
        )
        def check(texts):
            col = pa.array(texts, pa.string())
            f1, o1 = Shingler(k=2).shingle_hashes_batch_column(col)
            f2, o2 = Shingler(k=2).shingle_hashes_batch(texts)
            np.testing.assert_array_equal(o1, o2)
            np.testing.assert_array_equal(f1, f2)

        check()
