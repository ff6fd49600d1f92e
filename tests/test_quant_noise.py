"""iPQ quantization noise (``--quant-noise-pq``).

Reference semantics (``fairseq/modules/quant_noise.py``, copied into
``efficient_attention/causal_eva.py:118-215``): training drops
``block_size``-wide blocks of the weight's input dimension with
probability p and rescales survivors by 1/(1-p); eval uses clean weights.
"""
import jax
import jax.numpy as jnp
import numpy as np

from efficient_attention_tpu.attention.causal_eva import CausalEVAttention
from efficient_attention_tpu.models.quant_noise import (
    QuantNoiseDense,
    dense,
)
from efficient_attention_tpu.models.transformer import TransformerLM
from flax import linen as nn


class TestQuantNoiseDense:
    def test_p0_is_plain_dense(self):
        assert isinstance(dense(8, 0.0), nn.Dense)
        assert isinstance(dense(8, 0.3), QuantNoiseDense)

    def test_param_layout_matches_dense(self):
        x = jnp.ones((2, 16))
        plain = nn.Dense(8)
        noisy = QuantNoiseDense(8, p=0.3, block_size=4)
        p0 = plain.init(jax.random.PRNGKey(0), x)
        p1 = noisy.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p0) == \
            jax.tree_util.tree_structure(p1)
        # same init function -> same values: checkpoints interchange
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), p0, p1)

    def test_eval_is_clean(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
        noisy = QuantNoiseDense(8, p=0.9, block_size=4)
        params = noisy.init(jax.random.PRNGKey(1), x)
        np.testing.assert_array_equal(
            noisy.apply(params, x),
            nn.Dense(8).apply(params, x))

    def test_training_drops_blocks_at_rate_p(self):
        p, bs, in_f, out_f = 0.4, 4, 64, 96
        mod = QuantNoiseDense(out_f, p=p, block_size=bs, use_bias=False)
        x = jnp.eye(in_f)  # y row i == masked kernel row i
        params = mod.init(jax.random.PRNGKey(0), x)
        y = np.asarray(mod.apply(
            params, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7)}))
        # [nb, out_f, bs]: one block = bs consecutive input rows of one
        # output unit's column
        blocks = y.reshape(in_f // bs, bs, out_f).transpose(0, 2, 1)
        zeroed = np.all(blocks == 0.0, axis=2)  # [nb, out_f]
        # blocks are dropped whole: a block is either all-zero or all-kept
        kernel = np.asarray(params["params"]["kernel"])
        kblocks = kernel.reshape(in_f // bs, bs, out_f).transpose(0, 2, 1)
        np.testing.assert_allclose(
            blocks[~zeroed], kblocks[~zeroed] / (1.0 - p), rtol=1e-6)
        rate = zeroed.mean()
        assert abs(rate - p) < 0.05, rate

    def test_distinct_noise_per_call_key(self):
        mod = QuantNoiseDense(8, p=0.5, block_size=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
        params = mod.init(jax.random.PRNGKey(1), x)
        y1 = mod.apply(params, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
        y2 = mod.apply(params, x, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
        assert float(jnp.abs(y1 - y2).max()) > 0.0


class TestQuantNoiseInModels:
    def test_lm_eval_unaffected_and_training_runs(self):
        kw = dict(vocab_size=50, embed_dim=32, ffn_dim=64, num_layers=2,
                  num_heads=2, max_len=64, dropout=0.0)
        base = TransformerLM(**kw)
        qn = TransformerLM(quant_noise_pq=0.3,
                           quant_noise_pq_block_size=8, **kw)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 2, 50)
        params = base.init(jax.random.PRNGKey(1), tokens)
        # same layout -> same params load; eval forward identical
        np.testing.assert_array_equal(
            base.apply(params, tokens), qn.apply(params, tokens))
        # training forward applies noise (differs from clean) and is finite
        out = qn.apply(params, tokens, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(3)})
        assert bool(jnp.isfinite(out).all())
        assert float(jnp.abs(out - base.apply(params, tokens)).max()) > 0.0

        def loss_fn(p):
            return qn.apply(p, tokens, jnp.roll(tokens, -1, 1),
                            deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(3)},
                            method=qn.loss).mean()

        g = jax.grad(loss_fn)(params)
        assert all(bool(jnp.isfinite(x).all())
                   for x in jax.tree_util.tree_leaves(g))

    def test_causal_eva_q_noise(self):
        kw = dict(embed_dim=32, num_heads=2, window_size=8, chunk_size=4,
                  dropout=0.0, impl="xla")
        base = CausalEVAttention(**kw)
        qn = CausalEVAttention(q_noise=0.3, qn_block_size=8, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
        params = base.init(jax.random.PRNGKey(1), x)
        np.testing.assert_array_equal(
            base.apply(params, x), qn.apply(params, x))
        out = qn.apply(
            params, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3),
                  "sample": jax.random.PRNGKey(4)})
        assert bool(jnp.isfinite(out).all())
        assert float(jnp.abs(out - base.apply(params, x)).max()) > 0.0

    def test_quant_noise_composes_with_remat(self):
        kw = dict(vocab_size=50, embed_dim=32, ffn_dim=64, num_layers=2,
                  num_heads=2, max_len=64, dropout=0.0,
                  quant_noise_pq=0.3, quant_noise_pq_block_size=8)
        qn = TransformerLM(**kw)
        qn_remat = TransformerLM(checkpoint_activations=True, **kw)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 2, 50)
        params = qn.init(jax.random.PRNGKey(1), tokens)

        def grads(model):
            def loss_fn(p):
                return model.apply(
                    p, tokens, jnp.roll(tokens, -1, 1),
                    deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)},
                    method=model.loss).mean()

            return jax.grad(loss_fn)(params)

        # the same rng stream must draw the same noise masks inside and
        # outside the remat boundary -> identical gradients
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            grads(qn), grads(qn_remat))
