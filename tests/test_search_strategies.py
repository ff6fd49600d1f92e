"""Search strategies vs hand-computed beams (the predictable-probability-
table pattern of ``fairseq/tests/utils.py:64``): a step function returning
fixed log-prob tables lets every expansion be computed by hand.

Covers: prefix-constrained decoding (``--prefix-size`` /
``search.PrefixConstrainedBeamSearch``), Diverse Beam Search
(``search.py:551-631``) and Diverse Siblings (``search.py:745-796``).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.generation import SequenceGenerator

PAD, EOS = 1, 2
V = 6  # tokens: 0..5 (1=pad, 2=eos)


def _table_step(tables):
    """step_fn driven by per-step log-prob tables [L, V] (same for every
    beam/batch row)."""
    tables = jnp.asarray(tables, jnp.float32)

    def step_fn(cache, tokens, step):
        B = tokens.shape[0]
        row = jnp.take(tables, jnp.minimum(step, tables.shape[0] - 1), axis=0)
        return jnp.broadcast_to(row, (B, V)), cache

    return step_fn


def _logp(probs):
    """normalized log table from unnormalized positive weights."""
    arr = np.asarray(probs, np.float64)
    arr = arr / arr.sum(-1, keepdims=True)
    return np.log(arr)


class TestPrefixConstrained:
    def test_prefix_is_forced_then_free(self):
        # model always prefers token 3, but prefix [4, 5] must be emitted
        tables = _logp([[1, 1, 1e-9, 10, 1, 1]] * 4)
        gen = SequenceGenerator(_table_step(tables), lambda b, l: (),
                                vocab_size=V, beam_size=2, max_len=4,
                                eos=EOS, pad=PAD, len_penalty=0.0)
        prefix = jnp.asarray([[4, 5]], jnp.int32)
        tokens, _ = gen.generate(batch=1, prefix_tokens=prefix)
        hyps = np.asarray(tokens[0, :, 1:])
        # every hypothesis respects the prefix
        assert (hyps[:, 0] == 4).all() and (hyps[:, 1] == 5).all()
        # the free continuation (model's favorite token 3) appears once the
        # constraint ends; the top beam may finish immediately (shorter is
        # better at len_penalty 0)
        assert 3 in hyps[:, 2] or (hyps[:, 2] == EOS).all()

    def test_pad_in_prefix_releases_constraint(self):
        tables = _logp([[1, 1, 1e-9, 10, 1, 1]] * 4)
        gen = SequenceGenerator(_table_step(tables), lambda b, l: (),
                                vocab_size=V, beam_size=2, max_len=4,
                                eos=EOS, pad=PAD, len_penalty=0.0)
        prefix = jnp.asarray([[4, PAD]], jnp.int32)  # only step 0 forced
        tokens, _ = gen.generate(batch=1, prefix_tokens=prefix)
        hyps = np.asarray(tokens[0, :, 1:])
        assert (hyps[:, 0] == 4).all()
        assert 3 in hyps[:, 1]  # free at step 1

    def test_per_row_prefixes(self):
        tables = _logp([[1, 1, 1e-9, 10, 1, 1]] * 4)
        gen = SequenceGenerator(_table_step(tables), lambda b, l: (),
                                vocab_size=V, beam_size=2, max_len=3,
                                eos=EOS, pad=PAD, len_penalty=0.0)
        prefix = jnp.asarray([[4], [5]], jnp.int32)
        tokens, _ = gen.generate(batch=2, prefix_tokens=prefix)
        assert int(tokens[0, 0, 1]) == 4
        assert int(tokens[1, 0, 1]) == 5


class TestDiverseBeam:
    def test_groups_avoid_each_others_tokens(self):
        # step 0: token 0 hugely dominant; with 2 groups and a strong
        # penalty, group 1 must pick the runner-up (token 3) instead of
        # copying group 0's choice
        # step 0: token 0 dominant, eos negligible; step 1: eos dominant so
        # both (diverse) beams finish and land in the returned pool
        tables = _logp([[100, 1e-9, 1e-12, 50, 1, 1],
                        [1e-9, 1e-9, 100, 1e-9, 1e-9, 1e-9]])
        gen = SequenceGenerator(
            _table_step(tables), lambda b, l: (), vocab_size=V, beam_size=2,
            max_len=3, eos=EOS, pad=PAD, len_penalty=0.0,
            diversity_groups=2, diversity_strength=1000.0)
        tokens, _ = gen.generate(batch=1)
        first = {int(tokens[0, k, 1]) for k in range(2)}
        assert first == {0, 3}, first

    def test_zero_strength_matches_plain_beam(self):
        rng = np.random.default_rng(0)
        tables = _logp(rng.uniform(0.1, 1.0, (4, V)))
        plain = SequenceGenerator(
            _table_step(tables), lambda b, l: (), vocab_size=V, beam_size=2,
            max_len=3, eos=EOS, pad=PAD, len_penalty=0.0)
        diverse = SequenceGenerator(
            _table_step(tables), lambda b, l: (), vocab_size=V, beam_size=2,
            max_len=3, eos=EOS, pad=PAD, len_penalty=0.0,
            diversity_groups=2, diversity_strength=0.0)
        t1, s1 = plain.generate(batch=1)
        t2, s2 = diverse.generate(batch=1)
        # same best hypothesis and score (groups partition the beams, so
        # only the top-1 is guaranteed identical)
        np.testing.assert_array_equal(np.asarray(t1[0, 0]),
                                      np.asarray(t2[0, 0]))
        assert abs(float(s1[0, 0]) - float(s2[0, 0])) < 1e-5

    def test_beam_not_divisible_raises(self):
        with pytest.raises(ValueError):
            SequenceGenerator(lambda *a: None, lambda b, l: (), vocab_size=V,
                              beam_size=3, diversity_groups=2)


class TestDiverseSiblings:
    def test_rank_penalty_hand_computed(self):
        # single step, beam 2, gamma large enough that each beam's rank-2
        # sibling is pushed below the other beam's rank-1:
        # logp = [a=log .5, b=log .3, ...] -> with gamma=0.4:
        #   rank1: a-0.4, rank2: b-0.8  => selection: both beams' rank-1
        p = [0.5, 1e-9, 1e-12, 0.3, 0.15, 0.05]
        fin = [1e-9, 1e-9, 100.0, 1e-9, 1e-9, 1e-9]  # step 1: eos dominant
        tables = _logp([p, fin])
        gamma = 0.4
        gen = SequenceGenerator(
            _table_step(tables), lambda b, l: (), vocab_size=V, beam_size=2,
            max_len=2, eos=EOS, pad=PAD, len_penalty=0.0,
            diverse_siblings_gamma=gamma)
        tokens, scores = gen.generate(batch=1)
        # step 0 starts with one live beam; its two best siblings emit
        # tokens 0 and 3 with penalized scores logp - gamma*rank, then both
        # finish with eos at step 1
        got = sorted(int(tokens[0, k, 1]) for k in range(2))
        assert got == [0, 3]
        logp0 = _logp([p])[0]
        eoslp = _logp([fin])[0][EOS]
        want = sorted([logp0[0] - gamma * 1 + eoslp,
                       logp0[3] - gamma * 2 + eoslp], reverse=True)
        np.testing.assert_allclose(
            np.sort(np.asarray(scores[0]))[::-1], want, atol=1e-3)

    def test_mutually_exclusive_strategies(self):
        with pytest.raises(ValueError):
            SequenceGenerator(lambda *a: None, lambda b, l: (), vocab_size=V,
                              beam_size=4, diversity_groups=2,
                              diverse_siblings_gamma=0.1)


class TestLexicallyConstrained:
    """DBA lexically-constrained decoding (``search.py:210-527``) via the
    static automata of ``generation/constraints.py``."""

    def _gen(self, tables, beam=2, max_len=6, **kw):
        return SequenceGenerator(_table_step(tables), lambda b, l: (),
                                 vocab_size=V, beam_size=beam,
                                 max_len=max_len, eos=EOS, pad=PAD,
                                 len_penalty=0.0, **kw)

    def test_single_token_constraint_steers(self):
        # the model strongly prefers 3-then-eos; constraint demands a 5
        tables = _logp([[1, 1, 1e-6, 100, 1, 1e-3],
                        [1, 1, 100, 10, 1, 1e-3]] * 3)
        gen = self._gen(tables, max_len=5)
        cons = jnp.asarray([[[5, PAD, PAD]]], jnp.int32)  # [B=1, NC=1, CL=3]
        tokens, scores = gen.generate(batch=1, constraints=cons)
        best = np.asarray(tokens[0, 0])
        assert 5 in best.tolist(), best
        assert EOS in best[1:].tolist()  # still terminates

    def test_unconstrained_matches_plain_beam(self):
        tables = _logp([[1, 1, 1e-6, 10, 2, 1],
                        [1, 1, 50, 10, 2, 1]] * 2)
        gen = self._gen(tables, max_len=4)
        empty = jnp.full((1, 1, 2), PAD, jnp.int32)  # zero-length rows
        t_c, s_c = gen.generate(batch=1, constraints=empty)
        t_p, s_p = gen.generate(batch=1)
        np.testing.assert_array_equal(np.asarray(t_c), np.asarray(t_p))
        np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_p),
                                   atol=1e-5)

    def test_multi_token_constraint_contiguous(self):
        # constraint [4, 5] must appear contiguously; model prefers 3s
        tables = _logp([[1, 1, 1e-6, 100, 1, 1]] * 5
                       + [[1, 1, 100, 1, 1, 1]])
        gen = self._gen(tables, beam=4, max_len=6)
        cons = jnp.asarray([[[4, 5, PAD]]], jnp.int32)
        tokens, _ = gen.generate(batch=1, constraints=cons)
        best = np.asarray(tokens[0, 0]).tolist()
        ok = any(best[i] == 4 and best[i + 1] == 5
                 for i in range(len(best) - 1))
        assert ok, best

    def test_eos_banned_until_met(self):
        # model wants to stop immediately; constraint forces a 4 first
        tables = _logp([[1e-3, 1e-3, 100, 1e-3, 1, 1e-3]] * 4)
        gen = self._gen(tables, max_len=4)
        cons = jnp.asarray([[[4, PAD]]], jnp.int32)
        tokens, _ = gen.generate(batch=1, constraints=cons)
        best = np.asarray(tokens[0, 0]).tolist()
        eos_pos = best[1:].index(EOS) + 1
        assert 4 in best[1:eos_pos], best

    def test_two_constraints_both_satisfied(self):
        tables = _logp([[1, 1, 1e-6, 100, 1, 1]] * 5
                       + [[1, 1, 100, 1, 1, 1]])
        gen = self._gen(tables, beam=4, max_len=6)
        cons = jnp.asarray([[[4, PAD], [5, PAD]]], jnp.int32)
        tokens, _ = gen.generate(batch=1, constraints=cons)
        best = np.asarray(tokens[0, 0]).tolist()
        assert 4 in best[1:] and 5 in best[1:], best

    def test_duplicate_constraint_needs_two_occurrences(self):
        tables = _logp([[1, 1, 1e-6, 100, 1, 1]] * 5
                       + [[1, 1, 100, 1, 1, 1]])
        gen = self._gen(tables, beam=4, max_len=6)
        cons = jnp.asarray([[[4, PAD], [4, PAD]]], jnp.int32)
        tokens, _ = gen.generate(batch=1, constraints=cons)
        best = np.asarray(tokens[0, 0]).tolist()
        assert best[1:].count(4) >= 2, best

    def test_per_row_constraints(self):
        # row 0 requires a 4, row 1 requires a 5; model prefers 3
        tables = _logp([[1, 1, 1e-6, 100, 1, 1],
                        [1, 1, 100, 10, 1, 1]] * 3)
        gen = self._gen(tables, max_len=5)
        cons = jnp.asarray([[[4, PAD]], [[5, PAD]]], jnp.int32)
        tokens, _ = gen.generate(batch=2, constraints=cons)
        assert 4 in np.asarray(tokens[0, 0]).tolist()[1:]
        assert 5 in np.asarray(tokens[1, 0]).tolist()[1:]


class TestConstraintAutomata:
    """Unit semantics of the fixed-shape constraint state."""

    def _mk(self, rows, CL=4):
        import numpy as _np
        cons = _np.full((1, len(rows), CL), PAD, _np.int32)
        for i, r in enumerate(rows):
            cons[0, i, :len(r)] = r
        return jnp.asarray(cons)

    def _run(self, rows, tokens):
        from efficient_attention_tpu.generation import constraints as C
        cons = self._mk(rows)
        lens = C.constraint_lengths(cons, PAD)
        st = C.init_state(1, 1, cons.shape[1])
        for t in tokens:
            st = C.advance(cons, lens, st,
                           jnp.asarray([[t]], jnp.int32))
        return C, cons, lens, st

    def test_progress_and_bank(self):
        C, cons, lens, st = self._run([[4, 5, 3]], [4, 5])
        assert int(st.pos[0, 0, 0]) == 2 and not bool(st.met[0, 0, 0])
        assert int(C.bank(lens, st)[0, 0]) == 2

    def test_mismatch_rewinds_to_root(self):
        C, cons, lens, st = self._run([[4, 5, 3]], [4, 0])
        assert int(st.pos[0, 0, 0]) == 0
        # restart directly on the first token (root child)
        C, cons, lens, st = self._run([[4, 5, 3]], [4, 4])
        assert int(st.pos[0, 0, 0]) == 1

    def test_completion_and_finished(self):
        C, cons, lens, st = self._run([[4, 5]], [4, 5])
        assert bool(st.met[0, 0, 0])
        assert bool(C.finished(lens, st)[0, 0])
        assert int(C.bank(lens, st)[0, 0]) == 2  # met tokens count

    def test_overlapping_match_recognized(self):
        # constraints ["a b c", "b d"] over "a b d": the b inside the dead
        # "a b" prefix also starts "b d" (the reference trie misses this)
        a, b, c, d = 3, 4, 5, 0
        C, cons, lens, st = self._run([[a, b, c], [b, d]], [a, b, d])
        assert bool(st.met[0, 0, 1])

    def test_duplicate_rows_complete_one_at_a_time(self):
        C, cons, lens, st = self._run([[4], [4]], [4])
        met = np.asarray(st.met[0, 0])
        assert met.tolist() == [True, False]
        assert not bool(C.finished(lens, st)[0, 0])
        C2, cons2, lens2, st2 = self._run([[4], [4]], [4, 4])
        assert np.asarray(st2.met[0, 0]).tolist() == [True, True]


class TestDBAStripeRegression:
    def test_long_constraint_does_not_evict_all_banks(self):
        """Review regression: with a constraint longer than the candidate
        list, the stripe multiplier must still allocate beam slots across
        banks (rank-0 of every bank before any rank-1) — fairseq's fixed
        multiplier overflows here and hands every slot to the deep bank."""
        import numpy as _np

        from efficient_attention_tpu.generation import constraints as C

        K, V, L = 2, 6, 20
        cons = jnp.asarray(
            _np.full((1, 1, L), 0, _np.int32))  # 20-token constraint of 0s
        lens = C.constraint_lengths(cons, PAD)
        # BOTH beams deep into the constraint (pos 18) -> their constraint
        # tokens land in the same bank 19 (ranks 0 and 1); beam 1's best
        # free token (3) is the lone bank-0 candidate
        st = C.ConstraintState(
            pos=jnp.asarray([[[18], [18]]], jnp.int32),
            met=jnp.zeros((1, K, 1), bool))
        cand = jnp.asarray([[[-5.0, -1e9, -1e9, -6.0, -7.0, -8.0],
                             [-5.5, -1e9, -1e9, -0.1, -2.0, -3.0]]],
                           jnp.float32)
        alive = jnp.ones((1, K), bool)
        _, beams, toks = C.dba_select(cand, st, cons, lens, alive, K)
        picked = {(int(beams[0, k]), int(toks[0, k])) for k in range(K)}
        # round-robin: rank-0 of bank 19, then rank-0 of bank 0 — with the
        # old n+1 multiplier, bank 19's RANK-1 (stripe 9) beat bank 0's
        # rank-0 (stripe 19) and the whole beam collapsed into one bank
        assert (0, 0) in picked, picked       # bank-19 rank-0
        assert (1, 3) in picked, picked       # bank-0 rank-0


class TestLengthConstrained:
    """LengthConstrainedBeamSearch (``fairseq/search.py:526-549``):
    per-sentence min/max output lengths from ``src_lengths``, plus the
    scalar ``--min-len`` ban."""

    def test_min_len_bans_early_eos(self):
        # model always wants eos immediately; min_len=3 forces 3 real
        # tokens first
        tables = _logp([[1, 1, 100, 3, 1, 1]] * 6)
        gen = SequenceGenerator(_table_step(tables), lambda b, l: (),
                                vocab_size=V, beam_size=2, max_len=6,
                                eos=EOS, pad=PAD, len_penalty=0.0,
                                min_len=3)
        tokens, _ = gen.generate(batch=1)
        hyp = np.asarray(tokens[0, 0, 1:])
        eos_pos = np.where(hyp == EOS)[0]
        assert len(eos_pos) and eos_pos[0] == 3  # exactly 3 tokens then eos

    def test_max_len_a_forces_eos_per_sentence(self):
        # model never wants eos; max_len = 1*src + 0 forces it per row
        tables = _logp([[1, 1, 1e-9, 10, 1, 1]] * 8)
        gen = SequenceGenerator(_table_step(tables), lambda b, l: (),
                                vocab_size=V, beam_size=2, max_len=8,
                                eos=EOS, pad=PAD, len_penalty=0.0,
                                max_len_a=1.0, max_len_b=0)
        tokens, scores = gen.generate(
            batch=2, src_lengths=jnp.asarray([2.0, 4.0]))
        for b, want in [(0, 2), (1, 4)]:
            hyp = np.asarray(tokens[b, 0, 1:])
            eos_pos = np.where(hyp == EOS)[0]
            assert len(eos_pos) and eos_pos[0] == want, (b, hyp)
        assert np.isfinite(np.asarray(scores[:, 0])).all()

    def test_match_source_len_semantics(self):
        # min=max=src: output length equals the source length exactly
        tables = _logp([[1, 1, 5, 10, 1, 1]] * 8)  # eos is competitive
        gen = SequenceGenerator(_table_step(tables), lambda b, l: (),
                                vocab_size=V, beam_size=2, max_len=8,
                                eos=EOS, pad=PAD, len_penalty=0.0,
                                min_len=0, min_len_a=1.0,
                                max_len_a=1.0, max_len_b=0)
        tokens, _ = gen.generate(
            batch=2, src_lengths=jnp.asarray([3.0, 5.0]))
        for b, want in [(0, 3), (1, 5)]:
            hyp = np.asarray(tokens[b, 0, 1:])
            eos_pos = np.where(hyp == EOS)[0]
            assert len(eos_pos) and eos_pos[0] == want, (b, hyp)

    def test_scaled_lengths_require_src_lengths(self):
        gen = SequenceGenerator(_table_step(_logp([[1] * V])),
                                lambda b, l: (), vocab_size=V, beam_size=2,
                                max_len=4, eos=EOS, pad=PAD, max_len_a=1.0)
        with pytest.raises(ValueError):
            gen.generate(batch=1)


class TestToppSampling:
    def test_top_p_truncates_to_nucleus(self):
        import jax

        from efficient_attention_tpu.generation.beam_search import (
            sample_decode,
        )

        # token 3 holds ~0.9 of the mass: top_p=0.5 keeps only token 3
        table = _logp([[1, 1, 1e-6, 900, 50, 48]])

        def step_fn(cache, tokens, step):
            B = tokens.shape[0]
            return jnp.broadcast_to(jnp.asarray(table[0], jnp.float32),
                                    (B, V)), cache

        toks, scores = sample_decode(
            step_fn, lambda b, l: (), batch=4, max_len=5, bos=EOS, eos=EOS,
            rng=jax.random.PRNGKey(0), top_p=0.5, return_scores=True)
        assert (np.asarray(toks) == 3).all()
        # nucleus of one token -> per-step logp 0 under the renormalized
        # truncated distribution
        assert np.allclose(np.asarray(scores), 0.0, atol=1e-5)
