"""Native C++ helpers vs their Python references."""
import numpy as np
import pytest

from efficient_attention_tpu import native
from efficient_attention_tpu.data.text_data import batch_by_size
from efficient_attention_tpu.scoring.bleu import BleuScorer


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library could not be built")
    return lib


def test_batch_by_size_matches_python(lib):
    rng = np.random.default_rng(0)
    sizes = rng.integers(3, 40, size=200)
    indices = np.argsort(sizes, kind="stable")
    nat = native.batch_by_size_native(indices, sizes, 128,
                                      required_multiple=1)
    # same partition as pure python
    py = batch_by_size.__wrapped__ if hasattr(batch_by_size, "__wrapped__") \
        else None
    # manual python reference (mirrors text_data fallback)
    batches, cur, cur_max = [], [], 0
    for idx in indices:
        size = int(sizes[idx])
        new_max = max(cur_max, size)
        if cur and new_max * (len(cur) + 1) > 128:
            batches.append(cur)
            cur, cur_max = [], 0
        cur.append(int(idx))
        cur_max = max(cur_max, size)
    if cur:
        batches.append(cur)
    flat_nat = np.concatenate(nat)
    np.testing.assert_array_equal(np.sort(flat_nat), np.sort(indices))
    for b in nat:
        assert max(sizes[b]) * len(b) <= 128 or len(b) == 1


def test_bleu_native_matches_python(lib):
    rng = np.random.default_rng(1)
    match = np.zeros(4, np.int64)
    total = np.zeros(4, np.int64)
    scorer = BleuScorer()
    for _ in range(5):
        ref = rng.integers(4, 30, size=rng.integers(5, 20))
        hyp = np.concatenate([ref[:3], rng.integers(4, 30, size=8)])
        scorer.add(ref.tolist(), hyp.tolist())
        native.bleu_add_native(ref, hyp, match, total)
    np.testing.assert_array_equal(match, scorer.match)
    np.testing.assert_array_equal(total, scorer.total)


def test_edit_distance(lib):
    assert native.edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert native.edit_distance([1, 2, 3], [1, 3]) == 1
    assert native.edit_distance([1, 2], [3, 4, 5]) == 3
    assert native.edit_distance([], [1, 2]) == 2


def test_balanced_assignment(lib):
    rng = np.random.default_rng(2)
    scores = rng.standard_normal((8, 8)).astype(np.float32)
    out = native.balanced_assignment(scores)
    # a permutation: every job assigned exactly once
    assert sorted(out.tolist()) == list(range(8))
    # reasonably good total score vs random
    total = scores[np.arange(8), out].sum()
    assert total > scores[np.arange(8), rng.permutation(8)].sum() - 1e-3


def test_ngram_repeat_block(lib):
    tokens = np.array([[5, 6, 7, 5, 6]])  # next token 7 would repeat (5,6,7)
    banned = native.ngram_repeat_block(tokens, ngram_size=3)
    assert banned[0] == [7]
    tokens2 = np.array([[5, 6, 7, 8, 9]])
    assert native.ngram_repeat_block(tokens2, ngram_size=3)[0] == []


def test_bleu_known_value():
    """Hand-checked BLEU: identical hyp == 100."""
    s = BleuScorer()
    s.add([5, 6, 7, 8, 9], [5, 6, 7, 8, 9])
    assert abs(s.score() - 100.0) < 1e-6
    s2 = BleuScorer()
    s2.add([5, 6, 7, 8], [5, 6, 9, 8])
    assert 0.0 <= s2.score() < 100.0


class TestAlignmentTrain:
    """Monotonic-attention expected alignment: native CPU vs JAX scan
    (reference ``examples/operators/alignment_train_cpu.cpp``)."""

    def _rand(self, b=3, t=5, s=7, seed=0):
        rng = np.random.default_rng(seed)
        return rng.uniform(0.05, 0.95, (b, t, s)).astype(np.float32)

    def test_native_matches_jax(self):
        import jax.numpy as jnp

        from efficient_attention_tpu.native import alignment_train
        from efficient_attention_tpu.ops.alignment import (
            expected_alignment_from_p_choose,
        )

        p = self._rand()
        a_native = alignment_train(p)
        a_jax = np.asarray(
            expected_alignment_from_p_choose(jnp.asarray(p)))
        np.testing.assert_allclose(a_native, a_jax, atol=1e-5, rtol=1e-5)

    def test_python_fallback_matches_native(self, monkeypatch):
        from efficient_attention_tpu import native

        p = self._rand(seed=1)
        want = native.alignment_train(p)
        monkeypatch.setattr(native, "get_lib", lambda: None)
        got = native.alignment_train(p)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_hand_computed_first_row(self):
        # alpha_0 = p_0 * exclusive_cumprod(1 - p_0)  (scan term is 1)
        from efficient_attention_tpu.native import alignment_train

        p = self._rand(b=1, t=1, s=4, seed=2)
        row = p[0, 0]
        cpe = np.concatenate([[1.0], np.cumprod(1.0 - row)[:-1]])
        np.testing.assert_allclose(alignment_train(p)[0, 0], row * cpe,
                                   atol=1e-6)

    def test_hard_monotonic_stays_put(self):
        # p == 1 everywhere: source 0 is always chosen, so every target
        # step aligns to source 0 (the monotonic head never advances past
        # an always-accepting position)
        from efficient_attention_tpu.native import alignment_train

        p = np.ones((1, 3, 5), np.float32)
        a = alignment_train(p)
        want = np.zeros((3, 5), np.float32)
        want[:, 0] = 1.0
        np.testing.assert_allclose(a[0], want, atol=1e-6)

    def test_hard_reject_first_advances(self):
        # p[:, :, 0] == 0, p elsewhere == 1: the head skips source 0 and
        # locks onto source 1 for every target step
        from efficient_attention_tpu.native import alignment_train

        p = np.ones((1, 2, 4), np.float32)
        p[:, :, 0] = 0.0
        a = alignment_train(p)
        want = np.zeros((2, 4), np.float32)
        want[:, 1] = 1.0
        np.testing.assert_allclose(a[0], want, atol=1e-6)

    def test_rows_are_subprobability(self):
        from efficient_attention_tpu.native import alignment_train

        a = alignment_train(self._rand(seed=3))
        sums = a.sum(-1)
        assert (sums <= 1.0 + 1e-4).all() and (a >= 0).all()

    def test_jax_version_is_differentiable(self):
        import jax
        import jax.numpy as jnp

        from efficient_attention_tpu.ops.alignment import (
            expected_alignment_from_p_choose,
        )

        p = jnp.asarray(self._rand(b=1, t=3, s=4, seed=4))
        g = jax.grad(
            lambda x: expected_alignment_from_p_choose(x).sum())(p)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestScorers:
    """chrF and WER scorers (fairseq/scoring/{chrf,wer}.py equivalents;
    hand-computed statistics)."""

    def test_chrf_identical_is_100(self):
        from efficient_attention_tpu.scoring import ChrFScorer

        s = ChrFScorer()
        s.add_string("the quick brown fox", "the quick brown fox")
        assert abs(s.score() - 100.0) < 1e-9

    def test_chrf_hand_computed(self):
        # ref 'abcd', hyp 'abcx' (whitespace-free char ngrams):
        # n=1: match 3/4 -> F=0.75; n=2: 2/3; n=3: 1/2; n=4: 0;
        # n=5,6: no ngrams (skipped) -> chrF = 100 * mean(.75, 2/3, .5, 0)
        from efficient_attention_tpu.scoring import ChrFScorer

        s = ChrFScorer()
        s.add_string("abcd", "abcx")
        want = 100.0 * (0.75 + 2.0 / 3.0 + 0.5 + 0.0) / 4.0
        assert abs(s.score() - want) < 1e-9

    def test_chrf_removes_whitespace(self):
        from efficient_attention_tpu.scoring import ChrFScorer

        a, b = ChrFScorer(), ChrFScorer()
        a.add_string("ab cd", "ab cd")
        b.add_string("abcd", "abcd")
        assert abs(a.score() - b.score()) < 1e-9  # 100 both

    def test_wer_hand_computed(self):
        from efficient_attention_tpu.scoring import WerScorer

        s = WerScorer()
        # 1 substitution over 4 reference words -> 25%
        s.add_string("the cat sat down", "the dog sat down")
        assert abs(s.score() - 25.0) < 1e-9
        # plus 1 deletion over 2 more words -> (1+1)/6
        s.add_string("hello world", "world")
        assert abs(s.score() - 100.0 * 2 / 6) < 1e-9

    def test_score_cli_metrics(self, tmp_path):
        from efficient_attention_tpu.cli.score import cli_main

        (tmp_path / "sys.txt").write_text("the cat sat on the mat\n",
                                          encoding="utf-8")
        (tmp_path / "ref.txt").write_text("the cat sat on the mat\n",
                                          encoding="utf-8")
        args = ["--sys", str(tmp_path / "sys.txt"),
                "--ref", str(tmp_path / "ref.txt")]
        assert abs(cli_main(args + ["--metric", "chrf"]) - 100.0) < 1e-9
        assert cli_main(args + ["--metric", "wer"]) == 0.0
        assert abs(cli_main(args) - 100.0) < 1e-6  # bleu default

    def test_registry_unknown(self):
        import pytest as _pytest

        from efficient_attention_tpu.scoring import build_scorer

        with _pytest.raises(KeyError):
            build_scorer("meteor")
