"""Attention-zoo tests: construction, shapes, gradients, semantic equivalences.

The reference core library shipped no tests (SURVEY §4); here every attention
gets at least shape/finiteness/grad coverage plus the semantic anchors:
  * LocalAttention(window=N) == exact softmax with shared params,
  * EVA is causal-consistency-free (non-causal) but respects padding,
  * causal EVA parallel path is causal (the reference's own self-test,
    ``causal_eva.py:916-950``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu import AttentionFactory
from efficient_attention_tpu.attention import (
    EVA,
    KernelizedAttention,
    LinearRA,
    LocalAttention,
    MultiheadAttention,
    RandomizedAttention,
    ScatterBrain,
)

B, N, C, H = 2, 32, 48, 3


def init_and_apply(module, x, deterministic=True, rngs_extra=None, **kwargs):
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = module.init(rngs, x, deterministic=True, **kwargs)
    call_rngs = {"sample": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    out = module.apply(params, x, deterministic=deterministic, rngs=call_rngs, **kwargs)
    return out, params


class TestMultihead:
    def test_shapes_and_finite(self, rng):
        x = jax.random.normal(rng, (B, N, C))
        out, _ = init_and_apply(MultiheadAttention(dim=C, num_heads=H), x)
        assert out.shape == (B, N, C)
        assert jnp.isfinite(out).all()

    def test_padding_mask_invariance(self, rng):
        """Masked keys must not affect outputs of valid queries."""
        x = jax.random.normal(rng, (B, N, C))
        m = MultiheadAttention(dim=C, num_heads=H)
        params = m.init(jax.random.PRNGKey(0), x)
        mask = jnp.zeros((B, N), bool).at[:, N - 8:].set(True)
        out_masked = m.apply(params, x, key_padding_mask=mask)
        x2 = x.at[:, N - 8:].set(99.0)  # corrupt masked keys
        out_masked2 = m.apply(params, x2, key_padding_mask=mask)
        np.testing.assert_allclose(
            out_masked[:, : N - 8], out_masked2[:, : N - 8], atol=1e-5)

    def test_matches_manual_softmax(self, rng):
        x = jax.random.normal(rng, (1, 6, C))
        m = MultiheadAttention(dim=C, num_heads=H)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        # manual recompute from the same params
        kernel = params["params"]["qkv"]["kernel"]
        bias = params["params"]["qkv"]["bias"]
        qkv = x @ kernel + bias
        q, k, v = jnp.split(qkv.reshape(1, 6, 3, H, C // H), 3, axis=2)
        q, k, v = (jnp.swapaxes(t[:, :, 0], 1, 2) for t in (q, k, v))
        attn = jax.nn.softmax((q @ jnp.swapaxes(k, -1, -2)) * (C // H) ** -0.5, -1)
        ref = jnp.swapaxes(attn @ v, 1, 2).reshape(1, 6, C)
        ref = ref @ params["params"]["proj"]["kernel"] + params["params"]["proj"]["bias"]
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestLocal:
    @pytest.mark.parametrize("overlap", [False, True])
    @pytest.mark.parametrize("use_rpe", [False, True])
    def test_1d(self, rng, overlap, use_rpe):
        x = jax.random.normal(rng, (B, N, C))
        m = LocalAttention(dim=C, num_heads=H, window_size=8,
                           overlap_window=overlap, use_rpe=use_rpe)
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, N, C)
        assert jnp.isfinite(out).all()

    @pytest.mark.parametrize("overlap", [False, True])
    @pytest.mark.parametrize("use_rpe", [False, True])
    def test_2d(self, rng, overlap, use_rpe):
        x = jax.random.normal(rng, (B, 8, 8, C))
        m = LocalAttention(dim=C, num_heads=H, window_size=4, attn_2d=True,
                           overlap_window=overlap, use_rpe=use_rpe)
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, 8, 8, C)
        assert jnp.isfinite(out).all()

    def test_full_window_equals_softmax(self, rng):
        """Single window spanning the sequence == exact softmax attention."""
        x = jax.random.normal(rng, (B, N, C))
        soft = MultiheadAttention(dim=C, num_heads=H)
        params = soft.init(jax.random.PRNGKey(0), x)
        local = LocalAttention(dim=C, num_heads=H, window_size=N)
        out_soft = soft.apply(params, x)
        out_local = local.apply(params, x)
        np.testing.assert_allclose(out_soft, out_local, atol=2e-4)

    def test_ragged_length_padding(self, rng):
        """Non-multiple lengths are padded internally and unpadded on exit."""
        x = jax.random.normal(rng, (B, 27, C))
        m = LocalAttention(dim=C, num_heads=H, window_size=8)
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, 27, C)
        assert jnp.isfinite(out).all()


class TestKernelized:
    @pytest.mark.parametrize("method", [
        "favorp", "relu", "fourier", "dpfp", "mlp-fourier",
        "relu-only", "sigmoid-only"])
    def test_methods(self, rng, method):
        x = jax.random.normal(rng, (B, N, C))
        m = KernelizedAttention(dim=C, num_heads=H, proj_method=method,
                                approx_attn_dim=32)
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, N, C)
        assert jnp.isfinite(out).all()

    @pytest.mark.parametrize("scheme", ["default", "fixed", "learnable"])
    def test_sample_schemes(self, rng, scheme):
        x = jax.random.normal(rng, (B, N, C))
        m = KernelizedAttention(dim=C, num_heads=H, sample_scheme=scheme)
        out, _ = init_and_apply(m, x, deterministic=False)
        assert jnp.isfinite(out).all()

    def test_eval_is_deterministic(self, rng):
        x = jax.random.normal(rng, (B, N, C))
        m = KernelizedAttention(dim=C, num_heads=H)
        params = m.init(jax.random.PRNGKey(0), x)
        o1 = m.apply(params, x, deterministic=True)
        o2 = m.apply(params, x, deterministic=True)
        np.testing.assert_array_equal(o1, o2)

    def test_train_resamples(self, rng):
        x = jax.random.normal(rng, (B, N, C))
        m = KernelizedAttention(dim=C, num_heads=H)
        params = m.init(jax.random.PRNGKey(0), x)
        o1 = m.apply(params, x, deterministic=False,
                     rngs={"sample": jax.random.PRNGKey(1)})
        o2 = m.apply(params, x, deterministic=False,
                     rngs={"sample": jax.random.PRNGKey(2)})
        assert not jnp.allclose(o1, o2)

    def test_cosformer(self, rng):
        x = jax.random.normal(rng, (B, N, C))
        m = KernelizedAttention(dim=C, num_heads=H, cos_weighting=True)
        out, _ = init_and_apply(m, x)
        assert jnp.isfinite(out).all()

    def test_approximates_softmax(self, rng):
        """Performer with many features approximates exact softmax attention."""
        x = jax.random.normal(rng, (1, 16, C)) * 0.5
        soft = MultiheadAttention(dim=C, num_heads=H)
        params = soft.init(jax.random.PRNGKey(0), x)
        perf = KernelizedAttention(dim=C, num_heads=H, approx_attn_dim=4096)
        out_s = soft.apply(params, x)
        out_p = perf.apply(params, x, deterministic=True)
        err = jnp.abs(out_s - out_p).mean() / (jnp.abs(out_s).mean() + 1e-9)
        assert err < 0.15, f"relative error {err}"


class TestRandomized:
    @pytest.mark.parametrize("ns", [-1, 0, 1])
    def test_variants(self, rng, ns):
        x = jax.random.normal(rng, (B, N, C))
        m = RandomizedAttention(dim=C, num_heads=H, num_samples=ns)
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, N, C)
        assert jnp.isfinite(out).all()


class TestLARA:
    @pytest.mark.parametrize("mis", ["mis-opt", "mis-biased", "mis-bh"])
    def test_mis_types_1d(self, rng, mis):
        x = jax.random.normal(rng, (B, N, C))
        m = LinearRA(dim=C, num_heads=H, num_landmarks=8,
                     proposal_gen="adaptive-1d", mis_type=mis)
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, N, C)
        assert jnp.isfinite(out).all()

    @pytest.mark.parametrize("gen", ["pool", "no-param-pool", "pool-mixed",
                                     "pool-vmixed"])
    @pytest.mark.parametrize("pool_type", ["light", "dense"])
    def test_proposals_2d(self, rng, gen, pool_type):
        x = jax.random.normal(rng, (B, 8, 8, C))
        m = LinearRA(dim=C, num_heads=H, num_landmarks=4, proposal_gen=gen,
                     pool_module_type=pool_type)
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, 8, 8, C)
        assert jnp.isfinite(out).all()

    @pytest.mark.parametrize("flag", ["use_antithetics", "use_multisample"])
    def test_multi_sampling(self, rng, flag):
        x = jax.random.normal(rng, (B, N, C))
        m = LinearRA(dim=C, num_heads=H, num_landmarks=8,
                     proposal_gen="adaptive-1d", **{flag: True})
        out, _ = init_and_apply(m, x, deterministic=False)
        assert jnp.isfinite(out).all()

    def test_nondivisible_landmarks(self, rng):
        x = jax.random.normal(rng, (B, 30, C))
        m = LinearRA(dim=C, num_heads=H, num_landmarks=7, proposal_gen="adaptive-1d")
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, 30, C)
        assert jnp.isfinite(out).all()


class TestEVA:
    @pytest.mark.parametrize("adaptive", ["default", "no-ln", "none"])
    def test_1d(self, rng, adaptive):
        x = jax.random.normal(rng, (B, N, C))
        m = EVA(dim=C, num_heads=H, window_size=8, num_landmarks=4,
                adaptive_proj=adaptive)
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, N, C)
        assert jnp.isfinite(out).all()

    @pytest.mark.parametrize("overlap", [False, True])
    @pytest.mark.parametrize("rpe", ["none", "t5", "table"])
    def test_2d(self, rng, overlap, rpe):
        x = jax.random.normal(rng, (B, 8, 8, C))
        m = EVA(dim=C, num_heads=H, window_size=4, num_landmarks=4,
                attn_2d=True, overlap_window=overlap,
                use_t5_rpe=(rpe == "t5"), use_rpe=(rpe == "table"))
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, 8, 8, C)
        assert jnp.isfinite(out).all()

    def test_training_noise_and_eval_determinism(self, rng):
        x = jax.random.normal(rng, (B, N, C))
        m = EVA(dim=C, num_heads=H, window_size=8, num_landmarks=4)
        params = m.init(jax.random.PRNGKey(0), x)
        e1 = m.apply(params, x, deterministic=True)
        e2 = m.apply(params, x, deterministic=True)
        np.testing.assert_array_equal(e1, e2)
        t1 = m.apply(params, x, deterministic=False,
                     rngs={"sample": jax.random.PRNGKey(1)})
        t2 = m.apply(params, x, deterministic=False,
                     rngs={"sample": jax.random.PRNGKey(2)})
        assert not jnp.allclose(t1, t2)

    def test_padding_key_isolation(self, rng):
        """Corrupting masked positions must not change valid outputs."""
        x = jax.random.normal(rng, (B, 24, C))
        m = EVA(dim=C, num_heads=H, window_size=8, num_landmarks=4)
        params = m.init(jax.random.PRNGKey(0), x)
        mask = jnp.zeros((B, 24), bool).at[:, 20:].set(True)
        o1 = m.apply(params, x, key_padding_mask=mask)
        x2 = x.at[:, 20:].set(7.0)
        o2 = m.apply(params, x2, key_padding_mask=mask)
        np.testing.assert_allclose(o1[:, :20], o2[:, :20], atol=1e-5)


class TestScatterBrain:
    def test_shapes(self, rng):
        x = jax.random.normal(rng, (B, N, C))
        m = ScatterBrain(dim=C, num_heads=H, window_size=8, approx_attn_dim=32)
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, N, C)
        assert jnp.isfinite(out).all()

    def test_approximates_softmax(self, rng):
        x = jax.random.normal(rng, (1, 32, C)) * 0.5
        soft = MultiheadAttention(dim=C, num_heads=H)
        sp = soft.init(jax.random.PRNGKey(0), x)
        sb = ScatterBrain(dim=C, num_heads=H, window_size=8, approx_attn_dim=2048)
        out_s = soft.apply(sp, x)
        out_b = sb.apply(sp, x, deterministic=True)
        err = jnp.abs(out_s - out_b).mean() / (jnp.abs(out_s).mean() + 1e-9)
        assert err < 0.25, f"relative error {err}"


class TestFactory:
    @pytest.mark.parametrize("name,args", [
        ("softmax", {}),
        ("local", {"window_size": 8}),
        ("performer", {"approx_attn_dim": 32}),
        ("ra", {"num_samples": 1}),
        ("lara", {"num_landmarks": 8, "proposal_gen": "adaptive-1d"}),
        ("eva", {"window_size": 8, "num_landmarks": 4}),
        ("scatterbrain", {"window_size": 8, "approx_attn_dim": 32}),
    ])
    def test_build_and_run(self, rng, name, args):
        m = AttentionFactory.build_attention(
            name, dict(dim=C, num_heads=H, **args))
        x = jax.random.normal(rng, (B, N, C))
        out, _ = init_and_apply(m, x)
        assert out.shape == (B, N, C)

    def test_unknown_args_dropped(self):
        m = AttentionFactory.build_attention(
            "softmax", {"dim": C, "num_heads": H, "bogus_flag": 1})
        assert m.dim == C


class TestGradients:
    @pytest.mark.parametrize("name,args", [
        ("softmax", {}),
        ("local", {"window_size": 8, "use_rpe": True}),
        ("performer", {"approx_attn_dim": 32}),
        ("lara", {"num_landmarks": 8, "proposal_gen": "adaptive-1d"}),
        ("eva", {"window_size": 8, "num_landmarks": 4, "use_t5_rpe": True}),
    ])
    def test_grads_finite(self, rng, name, args):
        m = AttentionFactory.build_attention(name, dict(dim=C, num_heads=H, **args))
        x = jax.random.normal(rng, (B, N, C))
        params = m.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x, deterministic=True)

        def loss(p):
            out = m.apply(p, x, deterministic=False,
                          rngs={"sample": jax.random.PRNGKey(2),
                                "dropout": jax.random.PRNGKey(3)})
            return jnp.sum(out**2)

        grads = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(jnp.isfinite(g).all() for g in flat)
        assert any(jnp.abs(g).sum() > 0 for g in flat)
