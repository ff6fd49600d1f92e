"""Golden cross-framework tests: JAX modules vs recorded PyTorch-reference
outputs (SURVEY §7.1).

Fixtures in ``tests/goldens/*.npz`` were produced by
``scripts/make_goldens.py`` running the reference implementation
(/root/reference/efficient-attention) on CPU in eval mode with
deterministically-filled parameters.  These tests map the recorded torch
parameters onto the flax trees and assert output parity — pinning our
numerics to the reference, not merely to ourselves.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing "
                    "(run scripts/make_goldens.py)")
    data = np.load(path)
    params = {k[len("param:"):]: data[k] for k in data.files
              if k.startswith("param:")}
    return data["x"], data["out"], params


def _dense(tp, prefix):
    """torch Linear -> flax Dense params."""
    return {"kernel": jnp.asarray(tp[f"{prefix}.weight"].T),
            "bias": jnp.asarray(tp[f"{prefix}.bias"])}


def _ln(tp, prefix):
    """torch LayerNorm -> flax LayerNorm params."""
    return {"scale": jnp.asarray(tp[f"{prefix}.weight"]),
            "bias": jnp.asarray(tp[f"{prefix}.bias"])}


def _seq_dense_ln(tp, prefix):
    """torch nn.Sequential(Linear, LayerNorm) -> flax Sequential."""
    return {"layers_0": _dense(tp, f"{prefix}.0"),
            "layers_1": _ln(tp, f"{prefix}.1")}


class TestGoldenEVA:
    def test_eva_2d_rpe_matches_reference(self):
        from efficient_attention_tpu import AttentionFactory

        x, ref_out, tp = _load("eva_2d_rpe.npz")
        m = AttentionFactory.build_attention("eva", {
            "dim": 48, "num_heads": 4, "window_size": 4, "num_landmarks": 4,
            "attn_2d": True, "use_rpe": True, "adaptive_proj": "default",
            "impl": "xla"})
        params = {"params": {
            "qkv": _dense(tp, "qkv"),
            "proj": _dense(tp, "proj"),
            "adaptive_mu_q": _seq_dense_ln(tp, "adaptive_mu_q"),
            "adaptive_mu_k": _seq_dense_ln(tp, "adaptive_mu_k"),
            "local_relative_position_bias_table": jnp.asarray(
                tp["local_relative_position_bias_table"]),
        }}
        out = m.apply(params, jnp.asarray(x), deterministic=True)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=3e-5, rtol=1e-4)


class TestGoldenLocal:
    def test_local_2d_rpe_matches_reference(self):
        from efficient_attention_tpu import AttentionFactory

        x, ref_out, tp = _load("local_2d_rpe.npz")
        m = AttentionFactory.build_attention("local", {
            "dim": 48, "num_heads": 4, "window_size": 4,
            "attn_2d": True, "use_rpe": True})
        params = {"params": {
            "qkv": _dense(tp, "qkv"),
            "proj": _dense(tp, "proj"),
            "local_relative_position_bias_table": jnp.asarray(
                tp["local_relative_position_bias_table"]),
        }}
        out = m.apply(params, jnp.asarray(x), deterministic=True)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=3e-5, rtol=1e-4)


class TestGoldenSoftmax:
    def test_softmax_mha_matches_reference(self):
        from efficient_attention_tpu import AttentionFactory

        x, ref_out, tp = _load("softmax_mha.npz")
        m = AttentionFactory.build_attention(
            "softmax", {"dim": 48, "num_heads": 4})
        params = {"params": {
            "qkv": _dense(tp, "qkv"),
            "proj": _dense(tp, "proj"),
        }}
        out = m.apply(params, jnp.asarray(x), deterministic=True)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=3e-5, rtol=1e-4)


class TestGoldenCausalEVA:
    def test_causal_eva_parallel_matches_reference(self):
        from efficient_attention_tpu.attention.causal_eva import (
            CausalEVAttention,
        )

        x, ref_out, tp = _load("causal_eva_parallel.npz")
        m = CausalEVAttention(embed_dim=48, num_heads=4, window_size=8,
                              chunk_size=4, adaptive_proj="qk",
                              use_t5_rpe=True, causal=True)
        params = {"params": {
            "q_proj": _dense(tp, "q_proj"),
            "k_proj": _dense(tp, "k_proj"),
            "v_proj": _dense(tp, "v_proj"),
            "out_proj": _dense(tp, "out_proj"),
            "adaptive_mu_q": _seq_dense_ln(tp, "adaptive_mu_q"),
            "adaptive_mu_k": _seq_dense_ln(tp, "adaptive_mu_k"),
            "rel_pos_bias": jnp.asarray(
                tp["rel_pos_bias.relative_attention_bias.weight"]),
        }}
        out = m.apply(params, jnp.asarray(x), deterministic=True)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=3e-5, rtol=1e-4)


class TestGoldenLARA:
    def test_lara_pool_mixed_matches_reference(self):
        from efficient_attention_tpu import AttentionFactory

        x, ref_out, tp = _load("lara_pool_mixed.npz")
        m = AttentionFactory.build_attention("lara", {
            "dim": 48, "num_heads": 4, "num_landmarks": 4,
            "proposal_gen": "pool-mixed", "mis_type": "mis-opt",
            "attn_2d": True, "alpha_coeff": 2.0})
        params = {"params": {
            "qkv": _dense(tp, "qkv"),
            "proj": _dense(tp, "proj"),
            "q_bar_gen": {"layers_0": _dense(tp, "q_bar_gen.2"),
                          "layers_1": _ln(tp, "q_bar_gen.3")},
            "k_bar_gen": {"layers_0": _dense(tp, "k_bar_gen.2"),
                          "layers_1": _ln(tp, "k_bar_gen.3")},
        }}
        out = m.apply(params, jnp.asarray(x), deterministic=True)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=3e-5, rtol=1e-4)


class TestGoldenKernelized:
    def test_kernelized_favorp_matches_reference(self):
        from efficient_attention_tpu import AttentionFactory

        x, ref_out, tp = _load("kernelized_favorp.npz")
        # learnable sample scheme: the projection is a recorded parameter,
        # so both frameworks consume the identical matrix
        m = AttentionFactory.build_attention("performer", {
            "dim": 48, "num_heads": 4, "proj_method": "favorp",
            "sample_scheme": "learnable", "approx_attn_dim": 32})
        params = {"params": {
            "qkv": _dense(tp, "qkv"),
            "proj": _dense(tp, "proj"),
            "random_proj": jnp.asarray(tp["random_proj"]),
        }}
        out = m.apply(params, jnp.asarray(x), deterministic=True)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=3e-5, rtol=1e-4)


class TestGoldenScatterBrain:
    def test_scatterbrain_matches_reference(self):
        from efficient_attention_tpu import AttentionFactory

        x, ref_out, tp = _load("scatterbrain.npz")
        m = AttentionFactory.build_attention("scatterbrain", {
            "dim": 48, "num_heads": 4, "window_size": 4, "attn_2d": True,
            "proj_method": "favorp", "sample_scheme": "learnable",
            "approx_attn_dim": 32})
        params = {"params": {
            "qkv": _dense(tp, "qkv"),
            "proj": _dense(tp, "proj"),
            "random_proj": jnp.asarray(tp["random_proj"]),
        }}
        out = m.apply(params, jnp.asarray(x), deterministic=True)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   atol=3e-5, rtol=1e-4)
