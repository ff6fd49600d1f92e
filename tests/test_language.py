"""Language stack: models, criterions, data pipeline, generation.

Mirrors the intent of ``fairseq/tests/test_binaries.py`` at unit scale:
tiny models, synthetic corpora, full preprocess->train-step->generate loops.
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.data.dictionary import Dictionary
from efficient_attention_tpu.data.indexed_dataset import (
    MMapIndexedDataset,
    MMapIndexedDatasetBuilder,
    binarize_file,
)
from efficient_attention_tpu.data.text_data import (
    EpochBatchIterator,
    TokenBlockDataset,
    batch_by_size,
    collate_tokens,
)
from efficient_attention_tpu.generation import SequenceGenerator, greedy_decode
from efficient_attention_tpu.models.adaptive_softmax import (
    AdaptiveInput,
    AdaptiveSoftmax,
)
from efficient_attention_tpu.models.transformer import (
    TransformerLM,
    TransformerModel,
)
from efficient_attention_tpu.training.criterions import (
    adaptive_loss,
    cross_entropy_loss,
    label_smoothed_nll_loss,
)

V, D = 64, 32


class TestDictionary:
    def test_roundtrip(self, tmp_path):
        d = Dictionary.build_from_corpus(
            ["the cat sat", "the dog sat down", "the end"])
        assert d.index("the") < d.index("cat") or d.count[d.index("the")] >= 2
        ids = d.encode_line("the cat flew")
        assert ids[-1] == d.eos()
        assert ids[2] == d.unk()  # 'flew' unseen
        assert d.string(ids) == "the cat <unk>"
        p = str(tmp_path / "dict.txt")
        d.save(p)
        d2 = Dictionary.load(p)
        assert d2.indices == d.indices

    def test_padding_factor(self):
        d = Dictionary.build_from_corpus(["a b c"], padding_factor=8)
        assert len(d) % 8 == 0


class TestIndexedDataset:
    def test_roundtrip(self, tmp_path):
        prefix = str(tmp_path / "data")
        b = MMapIndexedDatasetBuilder(prefix)
        seqs = [np.array([1, 2, 3]), np.array([7, 8]), np.array([9])]
        for s in seqs:
            b.add_item(s)
        b.finalize()
        ds = MMapIndexedDataset(prefix)
        assert len(ds) == 3
        for got, want in zip([ds[i] for i in range(3)], seqs):
            np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(ds.sizes, [3, 2, 1])

    def test_binarize_file(self, tmp_path):
        text = tmp_path / "corpus.txt"
        text.write_text("a b c\nb c d\n")
        d = Dictionary.build_from_corpus(["a b c", "b c d"])
        stats = binarize_file(str(text), d, str(tmp_path / "bin"))
        assert stats["sequences"] == 2
        ds = MMapIndexedDataset(str(tmp_path / "bin"))
        assert len(ds) == 2
        assert ds[0][-1] == d.eos()


class TestBatching:
    def test_batch_by_size_budget(self):
        sizes = np.array([5, 5, 5, 9, 9, 20])
        batches = batch_by_size(np.arange(6), sizes, max_tokens=20,
                                required_multiple=1)
        for b in batches:
            assert max(sizes[b]) * len(b) <= 20 or len(b) == 1
        assert sorted(np.concatenate(batches)) == list(range(6))

    def test_collate(self):
        out = collate_tokens([np.array([4, 5, 2]), np.array([6, 2])],
                             pad_idx=1, pad_to_multiple=4)
        assert out.shape == (2, 4)
        np.testing.assert_array_equal(out[1], [6, 2, 1, 1])
        prev = collate_tokens([np.array([4, 5, 2])], pad_idx=1,
                              pad_to_multiple=4, move_eos_to_beginning=True)
        np.testing.assert_array_equal(prev[0], [2, 4, 5, 1])

    def test_token_block(self):
        ds = TokenBlockDataset(np.arange(10), block_size=4, pad_idx=1)
        assert len(ds) == 3
        np.testing.assert_array_equal(ds[2], [8, 9, 1, 1])

    def test_epoch_iterator_resume(self):
        ds = TokenBlockDataset(np.arange(128), block_size=8, pad_idx=1)
        it = EpochBatchIterator(ds, max_tokens=32,
                                collate_fn=lambda xs: np.stack(xs), seed=3)
        first = list(it.next_epoch_itr())
        # consume half, snapshot, resume
        it2 = EpochBatchIterator(ds, max_tokens=32,
                                 collate_fn=lambda xs: np.stack(xs), seed=3)
        gen = it2.next_epoch_itr()
        consumed = [next(gen) for _ in range(2)]
        state = it2.state_dict()
        it3 = EpochBatchIterator(ds, max_tokens=32,
                                 collate_fn=lambda xs: np.stack(xs), seed=3)
        it3.load_state_dict(state)
        rest = list(it3.next_epoch_itr())
        np.testing.assert_array_equal(
            np.concatenate([np.concatenate(consumed + rest, 0)], 0),
            np.concatenate(first, 0))

    def test_sharding(self):
        ds = TokenBlockDataset(np.arange(256), block_size=8, pad_idx=1)
        shards = [
            EpochBatchIterator(ds, 32, lambda xs: np.stack(xs), seed=1,
                               num_shards=2, shard_id=i)
            for i in range(2)]
        n0 = len(list(shards[0].next_epoch_itr()))
        n1 = len(list(shards[1].next_epoch_itr()))
        assert abs(n0 - n1) <= 1


class TestCriterions:
    def test_label_smoothing_reduces_to_ce(self, rng):
        logits = jax.random.normal(rng, (2, 5, V))
        targets = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 4, V)
        loss0, nll, n = label_smoothed_nll_loss(logits, targets, epsilon=0.0,
                                                pad_idx=None)
        np.testing.assert_allclose(loss0, nll, rtol=1e-5)
        ce, n2 = cross_entropy_loss(logits, targets, pad_idx=None)
        np.testing.assert_allclose(nll, ce, rtol=1e-5)

    def test_pad_masking(self, rng):
        logits = jax.random.normal(rng, (1, 4, V))
        targets = jnp.array([[5, 6, 1, 1]])
        _, _, n = label_smoothed_nll_loss(logits, targets, 0.1, pad_idx=1)
        assert n == 2


class TestAdaptiveSoftmax:
    def test_nll_matches_log_prob(self, rng):
        m = AdaptiveSoftmax(vocab_size=V, input_dim=D, cutoffs=(16, 32))
        x = jax.random.normal(rng, (3, 7, D))
        t = jax.random.randint(jax.random.PRNGKey(1), (3, 7), 0, V)
        params = m.init(jax.random.PRNGKey(0), x, t, method=AdaptiveSoftmax.nll)
        nll = m.apply(params, x, t, method=AdaptiveSoftmax.nll)
        lp = m.apply(params, x, method=AdaptiveSoftmax.log_prob)
        ref = -jnp.take_along_axis(lp, t[..., None], axis=-1)[..., 0]
        np.testing.assert_allclose(nll, ref, atol=1e-5)
        # log_prob rows normalize
        np.testing.assert_allclose(
            jnp.sum(jnp.exp(lp), -1), 1.0, rtol=1e-4)

    def test_adaptive_input(self, rng):
        m = AdaptiveInput(vocab_size=V, embed_dim=D, cutoffs=(16, 32))
        t = jax.random.randint(rng, (2, 9), 0, V)
        params = m.init(jax.random.PRNGKey(0), t)
        out = m.apply(params, t)
        assert out.shape == (2, 9, D)
        assert jnp.isfinite(out).all()


class TestTransformerModels:
    def test_mt_forward(self, rng):
        m = TransformerModel(
            src_vocab_size=V, tgt_vocab_size=V, embed_dim=D, ffn_dim=64,
            num_layers=2, num_heads=4,
            attn_name_encoder="eva",
            attn_args_encoder={"window_size": 4, "num_landmarks": 2},
            attn_name_decoder="causal_eva",
            attn_args_decoder={"window_size": 8, "chunk_size": 4,
                               "adaptive_proj": "qk"})
        src = jax.random.randint(rng, (2, 16), 4, V)
        prev = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 4, V)
        params = m.init(jax.random.PRNGKey(0), src, prev)
        logits = m.apply(params, src, prev)
        assert logits.shape == (2, 16, V)
        assert jnp.isfinite(logits).all()

    def test_lm_forward_and_loss(self, rng):
        m = TransformerLM(vocab_size=V, embed_dim=D, ffn_dim=64, num_layers=2,
                          num_heads=4, attn_name="causal_eva",
                          attn_args={"window_size": 8, "chunk_size": 4},
                          adaptive_cutoffs=(16, 32))
        toks = jax.random.randint(rng, (2, 16), 4, V)
        tgt = jnp.roll(toks, -1, axis=1)
        params = m.init(jax.random.PRNGKey(0), toks)
        nll = m.apply(params, toks, tgt, method=TransformerLM.loss)
        assert nll.shape == (2, 16)
        assert jnp.isfinite(nll).all()

    def test_mt_incremental_matches_parallel(self, rng):
        """Decoder KV-cache path == parallel teacher forcing (softmax dec)."""
        m = TransformerModel(
            src_vocab_size=V, tgt_vocab_size=V, embed_dim=D, ffn_dim=64,
            num_layers=2, num_heads=4,
            attn_name_decoder="softmax")
        src = jax.random.randint(rng, (2, 12), 4, V)
        prev = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 4, V)
        params = m.init(jax.random.PRNGKey(0), src, prev)
        full = m.apply(params, src, prev)
        enc_out, enc_pad = m.apply(params, src, method=TransformerModel.encode)
        states = m.apply(params, 2, 8, method=TransformerModel.init_decode_state)
        outs = []
        for t in range(8):
            logits, states = m.apply(
                params, states, prev[:, t:t + 1], t, enc_out, enc_pad,
                method=TransformerModel.decode_step)
            outs.append(logits[:, 0])
        inc = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(full, inc, atol=2e-4)

    def test_mt_static_kv_matches_parallel(self, rng):
        """fairseq ``static_kv`` analogue: cross-attn K/V projected ONCE at
        ``init_decode_state(..., enc_out=...)`` and decode steps called with
        ``enc_out=None`` must match parallel teacher forcing (reference
        ``transformer_layer.py:435-450``, ``multihead_attention.py:199-280``)."""
        m = TransformerModel(
            src_vocab_size=V, tgt_vocab_size=V, embed_dim=D, ffn_dim=64,
            num_layers=2, num_heads=4,
            attn_name_decoder="softmax")
        src = jax.random.randint(rng, (2, 12), 4, V)
        prev = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 4, V)
        params = m.init(jax.random.PRNGKey(0), src, prev)
        full = m.apply(params, src, prev)
        enc_out, enc_pad = m.apply(params, src, method=TransformerModel.encode)
        states = m.apply(params, 2, 8, jnp.float32, enc_out,
                         method=TransformerModel.init_decode_state)
        outs = []
        for t in range(8):
            logits, states = m.apply(
                params, states, prev[:, t:t + 1], t, None, enc_pad,
                method=TransformerModel.decode_step)
            outs.append(logits[:, 0])
        inc = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(full, inc, atol=2e-4)

    def test_lm_causal_eva_incremental_matches_parallel(self, rng):
        m = TransformerLM(vocab_size=V, embed_dim=D, ffn_dim=64, num_layers=2,
                          num_heads=4, attn_name="causal_eva",
                          attn_args={"window_size": 4, "chunk_size": 2})
        toks = jax.random.randint(rng, (2, 8), 4, V)
        params = m.init(jax.random.PRNGKey(0), toks)
        full = m.apply(params, toks)
        states = m.apply(params, 2, 8, method=TransformerLM.init_decode_state)
        outs = []
        for t in range(8):
            logits, states = m.apply(params, states, toks[:, t:t + 1], t,
                                     method=TransformerLM.decode_step)
            outs.append(logits[:, 0])
        inc = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(full, inc, atol=3e-4)


class TestGeneration:
    def _toy_step(self):
        """Deterministic toy LM: always prefers token (step+3), eos at 6."""
        Vt = 10

        def step_fn(cache, tokens, step):
            logits = jnp.full((tokens.shape[0], Vt), -10.0)
            tok = jnp.clip(step + 3, 0, Vt - 1)
            logits = logits.at[:, tok].set(5.0)
            logits = jnp.where(step >= 3,
                               logits.at[:, 2].set(8.0), logits)
            return logits, cache

        return step_fn, Vt

    def test_greedy(self):
        step_fn, Vt = self._toy_step()
        out = greedy_decode(step_fn, lambda b, l: (), batch=2, max_len=8,
                            bos=2, eos=2)
        np.testing.assert_array_equal(out[0, :4], [3, 4, 5, 2])

    def test_beam_finds_eos(self):
        step_fn, Vt = self._toy_step()
        gen = SequenceGenerator(step_fn, lambda b, l: (), vocab_size=Vt,
                                beam_size=3, max_len=8, len_penalty=1.0)
        tokens, scores = gen.generate(batch=2)
        assert tokens.shape == (2, 3, 9)
        # best hypothesis ends with eos
        row = np.asarray(tokens[0, 0])
        assert 2 in row[1:]
        assert scores[0, 0] >= scores[0, 1]

    def test_beam_with_real_lm(self, rng):
        m = TransformerLM(vocab_size=V, embed_dim=D, ffn_dim=64, num_layers=1,
                          num_heads=4, attn_name="softmax", max_len=64)
        toks = jax.random.randint(rng, (1, 8), 4, V)
        params = m.init(jax.random.PRNGKey(0), toks)

        def step_fn(cache, tokens, step):
            logits, cache = m.apply(params, cache, tokens, step,
                                    method=TransformerLM.decode_step)
            return logits[:, 0], cache

        def init_cache(b, l):
            return m.apply(params, b, l, method=TransformerLM.init_decode_state)

        gen = SequenceGenerator(step_fn, init_cache, vocab_size=V,
                                beam_size=2, max_len=12)
        tokens, scores = gen.generate(batch=2)
        assert tokens.shape == (2, 2, 13)
        assert jnp.isfinite(scores).all()


class TestNgramBlocking:
    def test_beam_no_repeat_ngram(self):
        """A looping toy LM repeats (3,4,5); 3-gram blocking must break it."""
        Vt = 10

        def step_fn(cache, tokens, step):
            # wants to emit the cycle 3,4,5,3,4,5,...
            logits = jnp.full((tokens.shape[0], Vt), -10.0)
            tok = 3 + (step % 3)
            logits = logits.at[:, tok].set(5.0)
            logits = logits.at[:, 2].set(-2.0)  # weak eos fallback
            return logits, cache

        gen = SequenceGenerator(step_fn, lambda b, l: (), vocab_size=Vt,
                                beam_size=2, max_len=10,
                                no_repeat_ngram_size=3)
        tokens, scores = gen.generate(batch=1)
        row = np.asarray(tokens[0, 0])
        # without blocking the greedy continuation would be 3,4,5,3,4,5,...;
        # blocking must prevent the second "3,4,5" completing: no position
        # repeats the trigram (3,4,5) twice
        tris = [tuple(row[i:i + 3]) for i in range(1, len(row) - 2)]
        assert tris.count((3, 4, 5)) <= 1

    def test_unblocked_repeats(self):
        Vt = 10

        def step_fn(cache, tokens, step):
            logits = jnp.full((tokens.shape[0], Vt), -10.0)
            tok = 3 + (step % 3)
            logits = logits.at[:, tok].set(5.0)
            return logits, cache

        gen = SequenceGenerator(step_fn, lambda b, l: (), vocab_size=Vt,
                                beam_size=2, max_len=10)
        tokens, _ = gen.generate(batch=1)
        row = np.asarray(tokens[0, 0])
        tris = [tuple(row[i:i + 3]) for i in range(1, len(row) - 2)]
        assert tris.count((3, 4, 5)) >= 2


class TestChunkedAdaptiveNLL:
    """Streaming-vocab adaptive NLL (memory-efficient CE): matches the
    dense log_prob-derived NLL exactly, including across chunk boundaries
    and in gradients."""

    def test_helper_matches_dense(self, rng):
        from efficient_attention_tpu.models.adaptive_softmax import (
            _chunked_lse_and_target,
        )

        k1, k2 = jax.random.split(rng)
        h = jax.random.normal(k1, (4, 7, 16))
        w = jax.random.normal(k2, (100, 16))
        tgt = jnp.asarray(np.random.default_rng(0).integers(0, 100, (4, 7)))
        lse, t = _chunked_lse_and_target(h, w, tgt, chunk_size=17)
        logits = h @ w.T
        np.testing.assert_allclose(np.asarray(lse),
                                   np.asarray(jax.nn.logsumexp(logits, -1)),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(t),
            np.asarray(jnp.take_along_axis(
                logits, tgt[..., None], -1)[..., 0]), rtol=1e-5)

        # gradients flow and match the dense formulation
        def loss_chunked(w):
            lse, t = _chunked_lse_and_target(h, w, tgt, chunk_size=17)
            return jnp.sum(lse - t)

        def loss_dense(w):
            lg = h @ w.T
            return jnp.sum(jax.nn.logsumexp(lg, -1) - jnp.take_along_axis(
                lg, tgt[..., None], -1)[..., 0])

        g1 = jax.grad(loss_chunked)(w)
        g2 = jax.grad(loss_dense)(w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-5, rtol=1e-4)

    def test_module_nll_matches_log_prob(self, rng):
        from efficient_attention_tpu.models.adaptive_softmax import (
            AdaptiveSoftmax,
        )

        m = AdaptiveSoftmax(vocab_size=100, input_dim=16, cutoffs=(30, 60))
        x = jax.random.normal(rng, (2, 5, 16))
        tgt = jnp.asarray(np.random.default_rng(1).integers(0, 100, (2, 5)))
        params = m.init(jax.random.PRNGKey(0), x, tgt, method="nll")
        nll = m.apply(params, x, tgt, method="nll")
        lp = m.apply(params, x, method="log_prob")
        want = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        np.testing.assert_allclose(np.asarray(nll), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_tied_module_nll_matches_log_prob(self, rng):
        from efficient_attention_tpu.models.transformer import TransformerLM

        m = TransformerLM(vocab_size=100, embed_dim=32, ffn_dim=64,
                          num_layers=1, num_heads=2,
                          adaptive_cutoffs=(30, 60), adaptive_input=True,
                          tie_adaptive=True, final_norm=False, dropout=0.0,
                          max_len=16)
        toks = jnp.asarray(
            np.random.default_rng(2).integers(2, 100, (2, 8)), jnp.int32)
        tgt = jnp.asarray(
            np.random.default_rng(3).integers(2, 100, (2, 8)), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), toks)
        nll = m.apply(params, toks, tgt, method="loss")
        lp = m.apply(params, toks)
        want = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        np.testing.assert_allclose(np.asarray(nll), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


class TestSoftmaxBatchChunking:
    """eval_lm --softmax-batch must bound live logits even below T by
    chunking the output projection over flattened tokens (fairseq
    SequenceScorer.batch_for_softmax; ADVICE r3)."""

    def test_chunked_nll_matches_full(self, rng):
        from efficient_attention_tpu.training.lm_steps import (
            make_lm_eval_step,
            make_lm_token_nll_step,
        )

        m = TransformerLM(vocab_size=V, embed_dim=D, ffn_dim=64,
                          num_layers=1, num_heads=4, attn_name="softmax")
        toks = jax.random.randint(rng, (3, 16), 4, V)
        tgt = jnp.roll(toks, -1, axis=1)
        mask = jnp.ones_like(tgt, bool)
        params = m.init(jax.random.PRNGKey(0), toks)
        full = make_lm_eval_step()(params, m.apply, toks, tgt, mask)
        # 7 deliberately doesn't divide B*T=48 (exercises the pad tail)
        for chunk in (7, 16, 48, 100):
            ch = make_lm_eval_step(softmax_chunk=chunk)(
                params, m.apply, toks, tgt, mask)
            np.testing.assert_allclose(float(ch[0]), float(full[0]),
                                       rtol=1e-5)
            assert float(ch[1]) == float(full[1])
        tn_full, _ = make_lm_token_nll_step()(params, m.apply, toks, tgt,
                                              mask)
        tn_ch, _ = make_lm_token_nll_step(softmax_chunk=7)(
            params, m.apply, toks, tgt, mask)
        np.testing.assert_allclose(np.asarray(tn_ch), np.asarray(tn_full),
                                   rtol=1e-5, atol=1e-5)


class TestLearnedPositions:
    """Padding-aware learned positional embeddings (fairseq
    LearnedPositionalEmbedding layout: pad_idx+1 offset, table size
    max_len + pad_idx + 1; ADVICE r3)."""

    def _model(self):
        return TransformerModel(
            src_vocab_size=V, tgt_vocab_size=V, embed_dim=D, ffn_dim=64,
            num_layers=1, num_heads=4,
            encoder_learned_pos=True, decoder_learned_pos=True,
            attn_name_decoder="softmax")

    def test_table_layout(self, rng):
        m = self._model()
        src = jax.random.randint(rng, (2, 8), 4, V)
        prev = jax.random.randint(rng, (2, 8), 4, V)
        params = m.init(jax.random.PRNGKey(0), src, prev)
        enc_pos = params["params"]["encoder"]["embed_positions"]
        # fairseq table size = num_embeddings + padding_idx + 1
        assert enc_pos.shape[0] >= 8 + 1 + 1

    def test_padding_invariance(self, rng):
        """Right-padding the source must not change non-pad outputs:
        positions count non-pad tokens, so they are identical with and
        without trailing pads (absolute-index positions would also pass
        this, but interior-pad equivalence below would not)."""
        m = self._model()
        src = jax.random.randint(rng, (1, 6), 4, V)
        prev = jax.random.randint(rng, (1, 6), 4, V)
        params = m.init(jax.random.PRNGKey(0), src, prev)
        out_plain = m.apply(params, src, prev, deterministic=True)
        src_pad = jnp.concatenate(
            [src, jnp.full((1, 3), 1, src.dtype)], axis=1)
        out_padded = m.apply(params, src_pad, prev, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(out_plain), np.asarray(out_padded),
            rtol=2e-4, atol=2e-4)

    def test_learned_pos_interop_key(self):
        from efficient_attention_tpu.interop import _lang_path_to_torch_key

        assert _lang_path_to_torch_key(
            ["encoder", "embed_positions"]) == \
            "encoder.embed_positions.weight"
