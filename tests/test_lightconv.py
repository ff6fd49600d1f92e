"""LightConv / DynamicConv family vs naive reference math
(``fairseq/modules/{lightweight,dynamic}_convolution.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.models.lightconv import (
    DynamicConv,
    LightConvLayer,
    LightConvModel,
    LightweightConv,
    _unfold_shifted,
)


def _naive_light(x, weight, padding_l, num_heads, softmax=True):
    """Loop reference: out[b,t,c] = sum_k w[h(c),k] x[b,t-pl+k,c]."""
    B, T, C = x.shape
    H, K = weight.shape
    if softmax:
        w = np.exp(weight - weight.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
    else:
        w = weight
    out = np.zeros_like(x)
    for c in range(C):
        h = c // (C // H)
        for t in range(T):
            for k in range(K):
                s = t - padding_l + k
                if 0 <= s < T:
                    out[:, t, c] += w[h, k] * x[:, s, c]
    return out


class TestLightweightConv:
    @pytest.mark.parametrize("K,padding_l", [(3, 1), (4, 1), (5, 4)])
    def test_matches_naive(self, K, padding_l):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 10, 8)).astype(np.float32)
        m = LightweightConv(input_size=8, kernel_size=K, padding_l=padding_l,
                            num_heads=2)
        p = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = np.asarray(p["params"]["weight"])
        out = m.apply(p, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out), _naive_light(x, w, padding_l, 2), atol=1e-5)

    def test_causal_no_future_leak(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 12, 8)).astype(np.float32)
        m = LightweightConv(input_size=8, kernel_size=5, padding_l=4,
                            num_heads=2)
        p = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out1 = np.asarray(m.apply(p, jnp.asarray(x)))
        x2 = x.copy()
        x2[:, 7:] += 10.0  # perturb the future
        out2 = np.asarray(m.apply(p, jnp.asarray(x2)))
        np.testing.assert_allclose(out1[:, :7], out2[:, :7], atol=1e-6)
        assert np.abs(out1[:, 7:] - out2[:, 7:]).max() > 0.1


class TestDynamicConv:
    def test_matches_naive(self):
        rng = np.random.default_rng(2)
        B, T, C, H, K, pl = 2, 9, 8, 2, 3, 2
        x = rng.normal(size=(B, T, C)).astype(np.float32)
        m = DynamicConv(input_size=C, kernel_size=K, padding_l=pl,
                        num_heads=H)
        p = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = np.asarray(m.apply(p, jnp.asarray(x)))
        # naive: per-position kernels from the linear layer
        Wl = np.asarray(p["params"]["weight_linear"]["kernel"])
        bl = np.asarray(p["params"]["weight_linear"]["bias"])
        w = (x @ Wl + bl).reshape(B, T, H, K)
        w = np.exp(w - w.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        R = C // H
        want = np.zeros_like(x)
        for b in range(B):
            for t in range(T):
                for h in range(H):
                    for k in range(K):
                        s = t - pl + k
                        if 0 <= s < T:
                            want[b, t, h * R:(h + 1) * R] += (
                                w[b, t, h, k] * x[b, s, h * R:(h + 1) * R])
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_unfold_shifted(self):
        x = jnp.arange(5, dtype=jnp.float32).reshape(1, 5, 1)
        u = _unfold_shifted(x, K=3, padding_l=2)  # causal: taps t-2, t-1, t
        np.testing.assert_allclose(np.asarray(u[0, :, 2, 0]),
                                   [0, 1, 2, 3, 4])
        np.testing.assert_allclose(np.asarray(u[0, :, 1, 0]),
                                   [0, 0, 1, 2, 3])
        np.testing.assert_allclose(np.asarray(u[0, :, 0, 0]),
                                   [0, 0, 0, 1, 2])


class TestLightConvModel:
    @pytest.mark.parametrize("conv_type", ["lightweight", "dynamic"])
    def test_forward_and_causality(self, conv_type):
        model = LightConvModel(
            src_vocab_size=20, tgt_vocab_size=24, embed_dim=16, ffn_dim=32,
            num_heads=2, conv_type=conv_type,
            encoder_kernels=(3, 5), decoder_kernels=(3, 5),
            dropout=0.0, weight_dropout=0.0, max_len=64)
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.integers(3, 20, (2, 7)), jnp.int32)
        tgt = jnp.asarray(rng.integers(3, 24, (2, 9)), jnp.int32)
        p = model.init(jax.random.PRNGKey(0), src, tgt, deterministic=True)
        out = model.apply(p, src, tgt, deterministic=True)
        assert out.shape == (2, 9, 24)
        assert bool(jnp.isfinite(out).all())
        # decoder causality: changing future target tokens must not change
        # earlier logits
        tgt2 = tgt.at[:, 5:].set(3)
        out2 = model.apply(p, src, tgt2, deterministic=True)
        np.testing.assert_allclose(np.asarray(out[:, :5]),
                                   np.asarray(out2[:, :5]), atol=1e-5)

    def test_registry_archs(self):
        from efficient_attention_tpu.models import create_model, list_models

        names = list_models()
        for arch in ("lightconv_wmt_en_de", "dynamicconv_wmt_en_de"):
            assert arch in names
        m = create_model("lightconv_wmt_en_de", src_vocab_size=10,
                         tgt_vocab_size=10, embed_dim=16, ffn_dim=32,
                         num_heads=2, max_len=32)
        assert isinstance(m, LightConvModel)

    def test_trains(self):
        import optax

        model = LightConvModel(
            src_vocab_size=12, tgt_vocab_size=12, embed_dim=16, ffn_dim=32,
            num_heads=2, conv_type="dynamic", encoder_kernels=(3,),
            decoder_kernels=(3,), dropout=0.0, weight_dropout=0.0,
            max_len=32)
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.integers(3, 12, (4, 6)), jnp.int32)
        tgt = jnp.asarray(rng.integers(3, 12, (4, 6)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), src, tgt,
                            deterministic=True)
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                logits = model.apply(p, src, tgt, deterministic=True)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, tgt).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            u, opt = tx.update(g, opt)
            return optax.apply_updates(params, u), opt, loss

        losses = []
        for _ in range(8):
            params, opt, loss = step(params, opt)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
