"""--activation-fn and learned positional embeddings (fairseq surface)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.models.transformer import (
    TransformerLM,
    TransformerModel,
    get_activation_fn,
)


def _lm(**kw):
    kw.setdefault("dropout", 0.0)
    return TransformerLM(vocab_size=50, embed_dim=32, ffn_dim=64,
                         num_layers=2, num_heads=2, max_len=64, **kw)


class TestActivationFn:
    def test_registry(self):
        x = jnp.array([-1.0, 0.5])
        np.testing.assert_array_equal(get_activation_fn("relu")(x),
                                      jax.nn.relu(x))
        np.testing.assert_array_equal(get_activation_fn("linear")(x), x)
        np.testing.assert_allclose(
            get_activation_fn("relu_squared")(x),
            jnp.square(jax.nn.relu(x)))
        # exact-erf gelu vs tanh approximation differ
        assert float(jnp.abs(get_activation_fn("gelu")(x)
                             - get_activation_fn("gelu_accurate")(x)).max()) \
            > 0.0
        with pytest.raises(ValueError):
            get_activation_fn("swish")

    def test_changes_model_output(self):
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 2, 50)
        relu, gelu = _lm(), _lm(activation_fn="gelu")
        params = relu.init(jax.random.PRNGKey(1), tokens)
        assert float(jnp.abs(relu.apply(params, tokens)
                             - gelu.apply(params, tokens)).max()) > 0.0

    def test_mt_activation_threads(self):
        kw = dict(src_vocab_size=40, tgt_vocab_size=40, embed_dim=32,
                  ffn_dim=64, num_layers=2, num_heads=2, max_len=64,
                  dropout=0.0)
        relu = TransformerModel(**kw)
        gelu = TransformerModel(activation_fn="gelu", **kw)
        src = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 2, 40)
        prev = jax.random.randint(jax.random.PRNGKey(2), (2, 10), 2, 40)
        params = relu.init(jax.random.PRNGKey(1), src, prev)
        assert float(jnp.abs(relu.apply(params, src, prev)
                             - gelu.apply(params, src, prev)).max()) > 0.0


class TestLearnedPos:
    def test_param_created_and_trains(self):
        lm = _lm(learned_pos=True)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 2, 50)
        params = lm.init(jax.random.PRNGKey(1), tokens)
        assert "embed_positions" in params["params"]["decoder"]

        def loss_fn(p):
            return lm.apply(p, tokens, jnp.roll(tokens, -1, 1),
                            method=lm.loss).mean()

        g = jax.grad(loss_fn)(params)
        pos_g = g["params"]["decoder"]["embed_positions"]
        # fairseq layout (padding-aware make_positions): with no pads the
        # occupied rows are pad_idx+1 .. pad_idx+T (= 2..17 for pad_idx 1);
        # rows 0..pad_idx are reserved and rows past pad_idx+T never index
        pad = 1
        assert float(jnp.abs(pos_g[pad + 1:pad + 17]).sum()) > 0.0
        assert float(jnp.abs(pos_g[:pad + 1]).sum()) == 0.0
        assert float(jnp.abs(pos_g[pad + 17:]).sum()) == 0.0

    def test_sinusoidal_has_no_param(self):
        lm = _lm()
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 2, 50)
        params = lm.init(jax.random.PRNGKey(1), tokens)
        assert "embed_positions" not in params["params"]["decoder"]
