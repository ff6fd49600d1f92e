"""Fused EVA Pallas kernel vs the pure-XLA reference path.

Runs the kernel in interpreter mode on the CPU mesh (semantic check); the
Mosaic-lowered path is exercised on real TPU by bench.py and the standalone
scripts/tpu_kernel_check.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.attention import EVA
from efficient_attention_tpu.ops.pallas.eva_kernel import eva_attention_fused
from efficient_attention_tpu.ops.random_features import prm_projection
from efficient_attention_tpu.ops import windows as W

B, H, D = 2, 3, 16


def _reference_joint_softmax(w_q, w_k, w_v, rf_k_bar, beta, scale, bias):
    """XLA reference of the fused computation (``eva.py:200-227``)."""
    local = jnp.einsum("bhgid,bhgjd->bhgij", w_q, w_k) * scale
    if bias is not None:
        local = local + bias[None, :, None]
    chunk = jnp.einsum("bhgid,bhcd->bhgic", w_q, scale * rf_k_bar)
    attn = jax.nn.softmax(jnp.concatenate([local, chunk], -1), -1)
    s = local.shape[-1]
    return (jnp.einsum("bhgij,bhgjd->bhgid", attn[..., :s], w_v)
            + jnp.einsum("bhgic,bhcd->bhgid", attn[..., s:], beta))


@pytest.mark.parametrize("g,s,c", [(8, 16, 4), (4, 8, 8)])
@pytest.mark.parametrize("with_bias", [False, True])
def test_kernel_matches_reference(rng, g, s, c, with_bias):
    keys = jax.random.split(rng, 6)
    shape = (B, H, g, s, D)
    w_q = jax.random.normal(keys[0], shape)
    w_k = jax.random.normal(keys[1], shape)
    w_v = jax.random.normal(keys[2], shape)
    rf = jax.random.normal(keys[3], (B, H, c, D))
    beta = jax.random.normal(keys[4], (B, H, c, D))
    bias = jax.random.normal(keys[5], (H, s, s)) if with_bias else None
    scale = D**-0.5
    ref = _reference_joint_softmax(w_q, w_k, w_v, rf, beta, scale, bias)
    out = eva_attention_fused(w_q, w_k, w_v, rf, beta, scale, bias,
                              interpret=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_eva_module_pallas_matches_xla(rng):
    """End-to-end: EVA module with impl differences only in the kernel."""
    C_dim = 48
    x = jax.random.normal(rng, (B, 16, 16, C_dim))
    m_xla = EVA(dim=C_dim, num_heads=H, window_size=4, num_landmarks=4,
                attn_2d=True, use_rpe=True, impl="xla")
    params = m_xla.init(jax.random.PRNGKey(0), x, deterministic=True)
    out_xla = m_xla.apply(params, x, deterministic=True)

    # manually replicate the pallas branch in interpret mode
    m = m_xla
    bound = m.bind(params)
    q, k, v = bound.proj_and_split_heads(x.reshape(B, 256, C_dim))
    seq_shape = (16, 16)
    w_q = bound.window_partition(q, seq_shape, ext_window_size=0)
    w_k = bound.window_partition(k, seq_shape, ext_window_size=0)
    w_v = bound.window_partition(v, seq_shape, ext_window_size=0)
    rf_win = 8  # sqrt(256 // 4) = 8
    rf_w_k = bound.window_partition(k, seq_shape, window_size=rf_win,
                                    ext_window_size=0)
    rf_w_q = bound.window_partition(q, seq_shape, window_size=rf_win,
                                    ext_window_size=0)
    rf_w_v = bound.window_partition(v, seq_shape, window_size=rf_win,
                                    ext_window_size=0)
    rf_q_bar = bound.adaptive_mu_q(jnp.mean(rf_w_q, axis=-2))
    rf_k_bar = bound.adaptive_mu_k(jnp.mean(rf_w_k, axis=-2))
    mu = 0.5 * (rf_q_bar + rf_k_bar)
    log_proj = prm_projection(rf_w_k, mu[..., None, :], normalize=False)[..., 0, :]
    beta = jnp.einsum("...cj,...cjd->...cd",
                      jax.nn.softmax(log_proj, -1), rf_w_v)
    w = 4
    bias = jnp.take(
        params["params"]["local_relative_position_bias_table"],
        jnp.asarray(bound._rpe_index), axis=0,
    ).reshape(w * w, w * w, H)
    bias = jnp.transpose(bias, (2, 0, 1))
    out_k = eva_attention_fused(w_q, w_k, w_v, rf_k_bar, beta, bound.scale,
                                bias, interpret=True)
    out_k = bound.window_merge(out_k, seq_shape)
    out_k = jnp.swapaxes(out_k, 1, 2).reshape(B, 16, 16, C_dim)
    out_k = bound.proj(out_k)
    np.testing.assert_allclose(out_k, out_xla, atol=5e-5, rtol=1e-4)


class TestKernelGradients:
    def test_custom_vjp_matches_xla_grads(self, rng):
        """Pallas forward + XLA-derived backward == pure-XLA gradients."""
        from efficient_attention_tpu.ops.pallas.eva_kernel import _xla_reference

        g, s, c = 4, 8, 4
        keys = jax.random.split(rng, 6)
        shape = (B, H, g, s, D)
        w_q = jax.random.normal(keys[0], shape)
        w_k = jax.random.normal(keys[1], shape)
        w_v = jax.random.normal(keys[2], shape)
        rf = jax.random.normal(keys[3], (B, H, c, D))
        beta = jax.random.normal(keys[4], (B, H, c, D))
        bias = jax.random.normal(keys[5], (H, s, s))
        scale = D**-0.5

        def loss_kernel(q, k, v, r, b, bi):
            return jnp.sum(eva_attention_fused(
                q, k, v, r, b, scale, bi, interpret=True) ** 2)

        def loss_ref(q, k, v, r, b, bi):
            return jnp.sum(_xla_reference(q, k, v, r, b, bi, scale) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(
            w_q, w_k, w_v, rf, beta, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
            w_q, w_k, w_v, rf, beta, bias)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(a, b_, atol=5e-4, rtol=1e-3)


class TestRowMajorKernel:
    def test_matches_swin_reference(self, rng):
        """Row-major kernel == Swin-partitioned reference computation."""
        from efficient_attention_tpu.ops.pallas.eva_rowmajor import (
            eva_attention_rowmajor,
        )
        from efficient_attention_tpu.ops import windows as W

        Wimg = 16
        ws, c = 4, 4
        N = Wimg * Wimg
        keys = jax.random.split(rng, 6)
        q = jax.random.normal(keys[0], (B, H, N, D))
        k = jax.random.normal(keys[1], (B, H, N, D))
        v = jax.random.normal(keys[2], (B, H, N, D))
        rf = jax.random.normal(keys[3], (B, H, c, D))
        beta = jax.random.normal(keys[4], (B, H, c, D))
        bias = jax.random.normal(keys[5], (H, ws * ws, ws * ws))
        scale = D**-0.5

        # Swin-ordered reference
        def part(t):
            return W.window_2d_partition(
                t.reshape(B, H, Wimg, Wimg, D), ws)

        ref_sw = _reference_joint_softmax(
            part(q), part(k), part(v), rf, beta, scale, bias)
        ref = W.window_2d_merge(ref_sw, ws, (Wimg, Wimg)).reshape(B, H, N, D)

        out = eva_attention_rowmajor(q, k, v, rf, beta, scale, Wimg, ws,
                                     bias=bias, interpret=True)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)

    def test_grads_match_reference(self, rng):
        from efficient_attention_tpu.ops.pallas.eva_rowmajor import (
            _xla_reference_rowmajor,
            eva_attention_rowmajor,
            rowmajor_bias_index,
        )

        Wimg, ws, c = 8, 4, 2
        N = Wimg * Wimg
        keys = jax.random.split(rng, 5)
        q = jax.random.normal(keys[0], (B, H, N, D))
        k = jax.random.normal(keys[1], (B, H, N, D))
        v = jax.random.normal(keys[2], (B, H, N, D))
        rf = jax.random.normal(keys[3], (B, H, c, D))
        beta = jax.random.normal(keys[4], (B, H, c, D))
        scale = D**-0.5

        def loss_k(q, k, v, rf, beta):
            return jnp.sum(eva_attention_rowmajor(
                q, k, v, rf, beta, scale, Wimg, ws, interpret=True) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(q, k, v, rf, beta)
        assert all(jnp.isfinite(g).all() for g in gk)
        assert all(float(jnp.abs(g).sum()) > 0 for g in gk)


class TestPackedKernel:
    """Packed zero-transpose kernel (``ops/pallas/eva_packed.py``) vs its
    XLA reference, in interpreter mode."""

    def _inputs(self, rng, Bp=2, Wimg=8, ws=4, nh=3, d=16, c=4):
        N = Wimg * Wimg
        keys = jax.random.split(rng, 4)
        qkv = jax.random.normal(keys[0], (Bp, N, 3 * nh * d))
        rf = jax.random.normal(keys[1], (Bp, c, nh * d))
        beta = jax.random.normal(keys[2], (Bp, c, nh * d))
        bias = jax.random.normal(keys[3], (nh, ws * ws, ws * ws)) * 0.1
        return qkv, rf, beta, bias

    def test_vmem_budget_is_chunk_aware(self):
        from efficient_attention_tpu.ops.pallas.eva_packed import _pick_rows

        # small C: floored at 128, so picks match the round-2 tuning
        assert _pick_rows(128, 784, 28, 7, c=49) == \
            _pick_rows(128, 784, 28, 7)
        # the DeiT bench geometry stays viable
        assert _pick_rows(128, 784, 28, 7, c=49) is not None
        # C >> 128 must shrink RB (or bail) instead of blowing scoped VMEM:
        # [RB, TGS, TGS+C] fp32 logits with C=4096 at RB=8 would be ~27MB
        big = _pick_rows(128, 784, 28, 7, c=4096)
        small = _pick_rows(128, 784, 28, 7)
        assert big is None or big[0] < small[0]

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_matches_reference(self, rng, with_bias):
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            _xla_reference,
            eva_attention_packed,
        )

        Wimg, ws, nh, d = 8, 4, 3, 16
        qkv, rf, beta, bias = self._inputs(rng, Wimg=Wimg, ws=ws, nh=nh, d=d)
        scale = d ** -0.5
        b = bias if with_bias else None
        ref = _xla_reference(qkv, rf, beta, scale, nh, Wimg, ws, b)
        out = eva_attention_packed(qkv, rf, beta, scale, nh, Wimg, ws,
                                   bias=b, interpret=True)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)

    @pytest.mark.parametrize("Wimg,ws,c,nh,d", [
        (8, 2, 4, 2, 8),     # many small windows, few chunks
        (12, 4, 9, 3, 16),   # non-power-of-two grid
        (16, 4, 16, 2, 8),   # larger strip count
        (6, 3, 4, 4, 8),     # odd window side
    ])
    def test_matches_reference_across_geometries(self, rng, Wimg, ws, c,
                                                 nh, d):
        # geometry sweep: strip size TGS=W*ws, window count, and chunk
        # count all vary; guards the static index math (visibility/bias
        # permutation) beyond the single bench-like geometry above
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            _xla_reference,
            eva_attention_packed,
        )

        qkv, rf, beta, bias = self._inputs(rng, Bp=2, Wimg=Wimg, ws=ws,
                                           nh=nh, d=d, c=c)
        scale = d ** -0.5
        ref = _xla_reference(qkv, rf, beta, scale, nh, Wimg, ws, bias)
        out = eva_attention_packed(qkv, rf, beta, scale, nh, Wimg, ws,
                                   bias=bias, interpret=True)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)

    def test_grads_match_reference(self, rng):
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            _xla_reference,
            eva_attention_packed,
        )

        Wimg, ws, nh, d = 8, 4, 3, 16
        qkv, rf, beta, bias = self._inputs(rng, Wimg=Wimg, ws=ws, nh=nh, d=d)
        scale = d ** -0.5

        def loss_pallas(qkv, rf, beta, bias):
            return jnp.sum(eva_attention_packed(
                qkv, rf, beta, scale, nh, Wimg, ws, bias=bias,
                interpret=True) ** 2)

        def loss_ref(qkv, rf, beta, bias):
            return jnp.sum(_xla_reference(
                qkv, rf, beta, scale, nh, Wimg, ws, bias) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(qkv, rf, beta, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qkv, rf, beta, bias)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)

    def test_eva_module_packed_summaries_match(self, rng):
        """The packed-layout chunk summaries equal the partitioned ones."""
        from efficient_attention_tpu.attention import EVA

        Bp, g, dim, nh = 2, 8, 48, 3
        x = jax.random.normal(rng, (Bp, g, g, dim))
        kw = dict(dim=dim, num_heads=nh, window_size=4, num_landmarks=4,
                  attn_2d=True, use_rpe=True)
        m_xla = EVA(**kw, impl="xla")
        params = m_xla.init(jax.random.PRNGKey(0), x, deterministic=True)
        out_xla = m_xla.apply(params, x, deterministic=True)

        # impl='packed' is TPU-gated; exercise its building blocks directly
        import math as _math
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            _xla_reference,
        )

        def packed_forward(params, x):
            def run(mod, x):
                N = g * g
                qkv = mod.qkv(x.reshape(Bp, N, dim))
                rf_p, beta_p = mod._chunk_summaries_packed(
                    qkv, (g, g), 4, True)
                bias = mod._window_bias_general()
                out = _xla_reference(qkv, rf_p, beta_p, mod.scale, nh, g,
                                     4, bias)
                y = mod.proj(out.reshape(Bp, g, g, dim))
                return mod.proj_dropout(y, deterministic=True)

            return nn_apply(m_xla, run, params, x)

        from flax import linen as nn

        def nn_apply(mod, fn, params, x):
            return nn.apply(fn, mod)(params, x)

        out_packed = packed_forward(params, x)
        np.testing.assert_allclose(np.asarray(out_packed),
                                   np.asarray(out_xla), atol=2e-5, rtol=1e-4)

    def test_windowed_vjp_source_matches_dense(self, rng):
        """The backward's windowed formulation equals the dense reference
        in both outputs and gradients."""
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            _xla_reference,
            _xla_windowed,
        )

        Wimg, ws, nh, d = 8, 4, 3, 16
        qkv, rf, beta, bias = self._inputs(rng, Wimg=Wimg, ws=ws, nh=nh, d=d)
        scale = d ** -0.5
        outw = _xla_windowed(qkv, rf, beta, scale, nh, Wimg, ws, bias)
        outd = _xla_reference(qkv, rf, beta, scale, nh, Wimg, ws, bias)
        np.testing.assert_allclose(outw, outd, atol=3e-5, rtol=1e-4)

        def loss(fn):
            return lambda *a: jnp.sum(
                fn(*a, scale, nh, Wimg, ws, bias) ** 2)

        gw = jax.grad(loss(_xla_windowed), argnums=(0, 1, 2))(qkv, rf, beta)
        gd = jax.grad(loss(_xla_reference), argnums=(0, 1, 2))(qkv, rf, beta)
        for a, b in zip(gw, gd):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)

    def test_rowmajor_vjp_source_matches_dense(self, rng):
        """The rowmajor-strip VJP source equals the dense reference in
        outputs and gradients."""
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            _xla_reference,
            _xla_rowmajor,
        )

        Wimg, ws, nh, d = 8, 4, 3, 16
        qkv, rf, beta, bias = self._inputs(rng, Wimg=Wimg, ws=ws, nh=nh, d=d)
        scale = d ** -0.5
        outw = _xla_rowmajor(qkv, rf, beta, scale, nh, Wimg, ws, bias)
        outd = _xla_reference(qkv, rf, beta, scale, nh, Wimg, ws, bias)
        np.testing.assert_allclose(outw, outd, atol=3e-5, rtol=1e-4)

        def loss(fn):
            return lambda *a: jnp.sum(
                fn(*a, scale, nh, Wimg, ws, bias) ** 2)

        gw = jax.grad(loss(_xla_rowmajor), argnums=(0, 1, 2))(qkv, rf, beta)
        gd = jax.grad(loss(_xla_reference), argnums=(0, 1, 2))(qkv, rf, beta)
        for a, b in zip(gw, gd):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


class TestLocalPacked:
    """Packed blocked-local kernel (``ops/pallas/local_packed.py``)."""

    def _inputs(self, rng, Bp=2, Wimg=8, ws=4, nh=3, d=16):
        N = Wimg * Wimg
        keys = jax.random.split(rng, 2)
        qkv = jax.random.normal(keys[0], (Bp, N, 3 * nh * d))
        bias = jax.random.normal(keys[1], (nh, ws * ws, ws * ws)) * 0.1
        return qkv, bias

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_matches_reference(self, rng, with_bias):
        from efficient_attention_tpu.ops.pallas.local_packed import (
            _xla_rowmajor,
            local_attention_packed,
        )

        Wimg, ws, nh, d = 8, 4, 3, 16
        qkv, bias = self._inputs(rng, Wimg=Wimg, ws=ws, nh=nh, d=d)
        scale = d ** -0.5
        b = bias if with_bias else None
        ref = _xla_rowmajor(qkv, scale, nh, Wimg, ws, b)
        out = local_attention_packed(qkv, scale, nh, Wimg, ws, bias=b,
                                     interpret=True)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)

    def test_strip_reference_matches_module_xla(self, rng):
        """The strip-form oracle equals the LocalAttention windowed-einsum
        module math."""
        from efficient_attention_tpu.attention import LocalAttention
        from efficient_attention_tpu.ops.pallas.local_packed import (
            _xla_rowmajor,
        )

        Bp, g, dim, nh, ws = 2, 8, 48, 3, 4
        x = jax.random.normal(rng, (Bp, g, g, dim))
        m = LocalAttention(dim=dim, num_heads=nh, window_size=ws,
                           attn_2d=True, use_rpe=True)
        params = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        out_mod = m.apply(params, x, deterministic=True)  # CPU: einsum path

        def packed_equiv(mod, x):
            qkv = mod.qkv(x.reshape(Bp, g * g, dim))
            bias = jnp.transpose(
                jnp.take(mod.local_relative_position_bias_table,
                         mod._rpe_index, axis=0)
                .reshape(ws * ws, ws * ws, nh), (2, 0, 1))
            out = _xla_rowmajor(qkv, mod.scale, nh, g, ws, bias)
            return mod.proj_dropout(mod.proj(out.reshape(Bp, g, g, dim)),
                                    deterministic=True)

        from flax import linen as nn

        out_strip = nn.apply(packed_equiv, m)(params, x)
        np.testing.assert_allclose(np.asarray(out_strip),
                                   np.asarray(out_mod), atol=3e-5, rtol=1e-4)

    def test_grads_flow(self, rng):
        from efficient_attention_tpu.ops.pallas.local_packed import (
            local_attention_packed,
        )

        qkv, bias = self._inputs(rng)

        def loss(qkv, bias):
            return jnp.sum(local_attention_packed(
                qkv, 0.25, 3, 8, 4, bias=bias, interpret=True) ** 2)

        g = jax.grad(loss, argnums=(0, 1))(qkv, bias)
        assert all(jnp.isfinite(x).all() for x in g)
        assert all(float(jnp.abs(x).sum()) > 0 for x in g)


class TestCausalPacked:
    """Fused causal-EVA parallel kernel (``ops/pallas/causal_packed.py``)
    vs its XLA reference and the module's XLA path, in interpreter mode."""

    def _inputs(self, rng, Bp=2, T=64, nh=2, d=64, c_sz=4):
        hd = nh * d
        C = T // c_sz
        keys = jax.random.split(rng, 6)
        q, k, v = (jax.random.normal(keys[i], (Bp, T, hd)) for i in range(3))
        rf = jax.random.normal(keys[3], (Bp, C, hd))
        bt = jax.random.normal(keys[4], (Bp, C, hd))
        w = 16
        tri = np.triu(np.ones((w, w), np.float32), 1)
        bias = (jnp.asarray(np.where(tri, -5e4, 0.0))
                + 0.1 * jax.random.normal(keys[5], (w, w)))
        return q, k, v, rf, bt, bias, w, c_sz

    def test_matches_reference(self, rng):
        from efficient_attention_tpu.ops.pallas.causal_packed import (
            _xla_reference,
            causal_eva_packed,
        )

        q, k, v, rf, bt, bias, w, cs = self._inputs(rng)
        nh, d = 2, 64
        scale = d ** -0.5
        ref = _xla_reference(q, k, v, rf, bt, bias, scale, nh, w, cs)
        out = causal_eva_packed(q, k, v, rf, bt, scale, nh, w, cs,
                                bias_tab=bias, interpret=True)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)

    def test_grads_match_reference(self, rng):
        from efficient_attention_tpu.ops.pallas.causal_packed import (
            _xla_reference,
            causal_eva_packed,
        )

        q, k, v, rf, bt, bias, w, cs = self._inputs(rng)
        nh, d = 2, 64
        scale = d ** -0.5

        def loss_k(*args):
            return jnp.sum(causal_eva_packed(
                *args[:5], scale, nh, w, cs, bias_tab=args[5],
                interpret=True) ** 2)

        def loss_r(*args):
            return jnp.sum(_xla_reference(*args, scale, nh, w, cs) ** 2)

        gk = jax.grad(loss_k, argnums=tuple(range(6)))(q, k, v, rf, bt, bias)
        gr = jax.grad(loss_r, argnums=tuple(range(6)))(q, k, v, rf, bt, bias)
        for a, b, name in zip(gk, gr, "q k v rf beta bias".split()):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
                err_msg=name)

    @pytest.mark.parametrize("t5", [False, True])
    def test_module_packed_matches_xla(self, rng, t5):
        from efficient_attention_tpu.attention.causal_eva import (
            CausalEVAttention,
        )

        kw = dict(embed_dim=128, num_heads=2, window_size=16, chunk_size=4,
                  causal=True, use_t5_rpe=t5, adaptive_proj="qk")
        x = jax.random.normal(rng, (2, 64, 128))
        m_x = CausalEVAttention(impl="xla", **kw)
        m_p = CausalEVAttention(impl="packed", **kw)
        params = m_x.init({"params": rng}, x, deterministic=True)
        out_x = m_x.apply(params, x, deterministic=True)
        out_p = m_p.apply(params, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=3e-5, rtol=1e-4)

    def test_module_packed_grads_match_xla(self, rng):
        from efficient_attention_tpu.attention.causal_eva import (
            CausalEVAttention,
        )

        kw = dict(embed_dim=128, num_heads=2, window_size=16, chunk_size=4,
                  causal=True, use_t5_rpe=True, adaptive_proj="qk")
        x = jax.random.normal(rng, (2, 64, 128))
        m_x = CausalEVAttention(impl="xla", **kw)
        m_p = CausalEVAttention(impl="packed", **kw)
        params = m_x.init({"params": rng}, x, deterministic=True)

        def loss(m, p):
            return jnp.sum(m.apply(p, x, deterministic=True) ** 2)

        gx = jax.grad(lambda p: loss(m_x, p))(params)
        gp = jax.grad(lambda p: loss(m_p, p))(params)
        flat_x = jax.tree_util.tree_leaves_with_path(gx)
        flat_p = jax.tree_util.tree_leaves_with_path(gp)
        for (path, a), (_, b) in zip(flat_x, flat_p):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3,
                err_msg=jax.tree_util.keystr(path))

    @pytest.mark.parametrize("T,w,cs,nh,d", [
        (96, 16, 4, 2, 64),   # windows not power-of-two count
        (64, 32, 8, 1, 64),   # single head, two windows
        (128, 16, 2, 3, 64),  # many tiny chunks
        (64, 64, 16, 2, 64),  # one window covering the sequence
    ])
    def test_matches_reference_across_geometries(self, rng, T, w, cs, nh, d):
        # sweep window/chunk/sequence combos: guards the in-kernel
        # chunk-causality iota math and the strip reshapes beyond the
        # single geometry above
        from efficient_attention_tpu.ops.pallas.causal_packed import (
            _xla_reference,
            causal_eva_packed,
        )

        hd = nh * d
        C = T // cs
        keys = jax.random.split(rng, 5)
        q, k, v = (jax.random.normal(keys[i], (2, T, hd)) for i in range(3))
        rf = jax.random.normal(keys[3], (2, C, hd))
        bt = jax.random.normal(keys[4], (2, C, hd))
        tri = np.triu(np.ones((w, w), np.float32), 1)
        bias = jnp.asarray(np.where(tri, -5e4, 0.0))
        scale = d ** -0.5
        ref = _xla_reference(q, k, v, rf, bt, bias, scale, nh, w, cs)
        out = causal_eva_packed(q, k, v, rf, bt, scale, nh, w, cs,
                                bias_tab=bias, interpret=True)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)

    def test_vmem_budget_scales_with_chunk_count(self):
        from efficient_attention_tpu.ops.pallas.causal_packed import (
            _pick_rows,
        )

        # wikitext bench geometry stays viable at RB=8
        assert _pick_rows(8, 2048, 128, 256, 512) == 8
        # T=8192 -> C=1024: the [RB, C, hd] summary blocks force RB down
        # (or out) instead of blowing scoped VMEM
        long_rb = _pick_rows(8, 8192, 128, 1024, 512)
        assert long_rb is None or long_rb < 8

    def test_direct_call_bad_geometry_raises_clearly(self, rng):
        from efficient_attention_tpu.ops.pallas.causal_packed import (
            causal_eva_packed,
        )

        q = jnp.ones((2, 64, 128))
        rf = jnp.ones((2, 8, 128))
        with pytest.raises(ValueError, match="unsupported geometry"):
            causal_eva_packed(q, q, q, rf, rf, 0.125, 2, window=48,
                              chunk=8, interpret=True)

    def test_strict_packed_raises_on_bad_geometry(self, rng):
        from efficient_attention_tpu.attention.causal_eva import (
            CausalEVAttention,
        )

        # window does not divide the sequence -> padding -> ineligible
        m = CausalEVAttention(embed_dim=128, num_heads=2, window_size=24,
                              chunk_size=4, causal=True, impl="packed")
        x = jax.random.normal(rng, (2, 64, 128))
        with pytest.raises(ValueError, match="impl='packed'"):
            m.init({"params": rng}, x, deterministic=True)


class TestEvaSummariesKernel:
    """Fused chunk-summary kernel (ops/pallas/eva_summaries.py) vs the
    module's XLA eval formulation, in interpreter mode."""

    @pytest.mark.parametrize("adaptive_proj", ["default", "no-ln"])
    @pytest.mark.parametrize("g,landmarks", [(8, 4), (12, 9)])
    def test_matches_module_eval_form(self, rng, adaptive_proj, g, landmarks):
        import math

        from flax import linen as nn

        from efficient_attention_tpu.attention import EVA
        from efficient_attention_tpu.ops.pallas.eva_summaries import (
            eva_summaries_packed,
            supports_summaries,
        )

        Bp, dim, nh = 2, 48, 3
        d = dim // nh
        j = int(math.sqrt(g * g // landmarks))
        x = jax.random.normal(rng, (Bp, g, g, dim))
        m = EVA(dim=dim, num_heads=nh, window_size=4,
                num_landmarks=landmarks, attn_2d=True,
                adaptive_proj=adaptive_proj, impl="xla")
        params = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        qkv = jax.random.normal(jax.random.PRNGKey(1),
                                (Bp, g * g, 3 * dim))
        assert supports_summaries(Bp, g, g, j, adaptive_proj)

        def ref(mod, qkv):
            return mod._chunk_summaries_packed(qkv, (g, g), j, True)

        rf_ref, beta_ref = nn.apply(ref, m)(params, qkv)

        pq = params["params"]["adaptive_mu_q"]
        pk = params["params"]["adaptive_mu_k"]
        use_ln = adaptive_proj == "default"
        ln = (lambda p, k: p["layers_1"][k] if use_ln else None)
        rf, beta = eva_summaries_packed(
            qkv, pq["layers_0"]["kernel"], pq["layers_0"]["bias"],
            pk["layers_0"]["kernel"], pk["layers_0"]["bias"],
            ln(pq, "scale"), ln(pq, "bias"), ln(pk, "scale"), ln(pk, "bias"),
            nh=nh, gw=g, j=j, use_ln=use_ln, interpret=True)
        np.testing.assert_allclose(np.asarray(rf), np.asarray(rf_ref),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(beta), np.asarray(beta_ref),
                                   atol=2e-5, rtol=1e-4)

    def test_rectangular_grid(self, rng):
        from flax import linen as nn

        from efficient_attention_tpu.attention import EVA
        from efficient_attention_tpu.ops.pallas.eva_summaries import (
            eva_summaries_packed,
        )

        Bp, gh, gw, dim, nh, j = 2, 4, 8, 48, 3, 2
        x = jax.random.normal(rng, (Bp, gh, gw, dim))
        m = EVA(dim=dim, num_heads=nh, window_size=2, num_landmarks=8,
                attn_2d=True, adaptive_proj="default", impl="xla")
        params = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        qkv = jax.random.normal(jax.random.PRNGKey(1), (Bp, gh * gw, 3 * dim))

        def ref(mod, qkv):
            return mod._chunk_summaries_packed(qkv, (gh, gw), j, True)

        rf_ref, beta_ref = nn.apply(ref, m)(params, qkv)
        pq = params["params"]["adaptive_mu_q"]
        pk = params["params"]["adaptive_mu_k"]
        rf, beta = eva_summaries_packed(
            qkv, pq["layers_0"]["kernel"], pq["layers_0"]["bias"],
            pk["layers_0"]["kernel"], pk["layers_0"]["bias"],
            pq["layers_1"]["scale"], pq["layers_1"]["bias"],
            pk["layers_1"]["scale"], pk["layers_1"]["bias"],
            nh=nh, gw=gw, j=j, use_ln=True, interpret=True)
        np.testing.assert_allclose(np.asarray(rf), np.asarray(rf_ref),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(beta), np.asarray(beta_ref),
                                   atol=2e-5, rtol=1e-4)


class TestEvaPackedFusedOut:
    """Eval-only fused-output-projection forward vs kernel + XLA proj."""

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_matches_unfused(self, rng, with_bias):
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            eva_attention_packed,
            eva_attention_packed_out,
        )

        Bp, Wimg, ws, c, nh, d = 2, 8, 4, 4, 3, 16
        hd = nh * d
        N = Wimg * Wimg
        k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
        qkv = jax.random.normal(k1, (Bp, N, 3 * hd))
        rf = jax.random.normal(k2, (Bp, c, hd))
        beta = jax.random.normal(k3, (Bp, c, hd))
        wo = jax.random.normal(k4, (hd, hd)) * 0.1
        bo = jax.random.normal(k5, (hd,)) * 0.1
        bias = (jax.random.normal(k6, (nh, ws * ws, ws * ws))
                if with_bias else None)
        scale = d ** -0.5
        ref = eva_attention_packed(qkv, rf, beta, scale, nh, Wimg, ws,
                                   bias=bias, interpret=True) @ wo + bo
        out = eva_attention_packed_out(qkv, rf, beta, wo, bo, scale, nh,
                                       Wimg, ws, bias=bias, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


class TestEvaMegaKernels:
    """Megakernel eval path (ops/pallas/eva_mega.py): x-consuming summaries
    and attention kernels match the qkv-consuming formulations."""

    def _setup(self, rng):
        Bp, g, dim, nh = 2, 8, 48, 3
        j = 2  # 16 landmarks on an 8x8 grid
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (Bp, g * g, dim))
        wqkv = jax.random.normal(k2, (dim, 3 * dim)) * 0.1
        bqkv = jnp.linspace(-0.1, 0.1, 3 * dim)
        return Bp, g, dim, nh, j, x, wqkv, bqkv

    def test_summaries_match_qkv_form(self, rng):
        from efficient_attention_tpu.ops.pallas.eva_mega import (
            eva_summaries_from_x,
        )
        from efficient_attention_tpu.ops.pallas.eva_summaries import (
            eva_summaries_packed,
        )

        Bp, g, dim, nh, j, x, wqkv, bqkv = self._setup(rng)
        d = dim // nh
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        wq = jax.random.normal(ks[0], (d, d)) * 0.2
        bq = jax.random.normal(ks[1], (d,)) * 0.1
        wk = jax.random.normal(ks[2], (d, d)) * 0.2
        bk = jax.random.normal(ks[3], (d,)) * 0.1
        lnp = [jnp.ones((d,)), jnp.zeros((d,))] * 2
        qkv = x @ wqkv + bqkv
        rf_ref, bt_ref = eva_summaries_packed(
            qkv, wq, bq, wk, bk, *lnp, nh=nh, gw=g, j=j, use_ln=True,
            interpret=True)
        rf, bt = eva_summaries_from_x(
            x, wqkv, bqkv, wq, bq, wk, bk, *lnp, nh=nh, gw=g, j=j,
            use_ln=True, interpret=True)
        np.testing.assert_allclose(np.asarray(rf), np.asarray(rf_ref),
                                   atol=3e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(bt), np.asarray(bt_ref),
                                   atol=3e-5, rtol=1e-4)

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_attention_matches_qkv_form(self, rng, with_bias):
        from efficient_attention_tpu.ops.pallas.eva_mega import (
            eva_attention_from_x,
        )
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            eva_attention_packed,
        )

        Bp, g, dim, nh, j, x, wqkv, bqkv = self._setup(rng)
        d = dim // nh
        ws = 4
        C = 16
        ks = jax.random.split(jax.random.PRNGKey(7), 5)
        rf = jax.random.normal(ks[0], (Bp, C, dim))
        bt = jax.random.normal(ks[1], (Bp, C, dim))
        wo = jax.random.normal(ks[2], (dim, dim)) * 0.1
        bo = jax.random.normal(ks[3], (dim,)) * 0.1
        bias = (jax.random.normal(ks[4], (nh, ws * ws, ws * ws))
                if with_bias else None)
        scale = d ** -0.5
        qkv = x @ wqkv + bqkv
        ref = eva_attention_packed(qkv, rf, bt, scale, nh, g, ws,
                                   bias=bias, interpret=True) @ wo + bo
        out = eva_attention_from_x(x, wqkv, bqkv, rf, bt, wo, bo, scale,
                                   nh, g, ws, bias=bias, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)


class TestEvaSingleKernel:
    """Single-pass fused EVA (ops/pallas/eva_single.py): in-kernel chunk
    summaries + joint attention vs the proven two-kernel composition
    (eva_summaries_packed -> eva_attention_packed), in interpreter mode."""

    def _params(self, d, seed=5):
        ks = jax.random.split(jax.random.PRNGKey(seed), 8)
        wq = jax.random.normal(ks[0], (d, d)) * 0.2
        bq = jax.random.normal(ks[1], (d,)) * 0.1
        wk = jax.random.normal(ks[2], (d, d)) * 0.2
        bk = jax.random.normal(ks[3], (d,)) * 0.1
        lnq_s = 1.0 + 0.1 * jax.random.normal(ks[4], (d,))
        lnq_b = 0.1 * jax.random.normal(ks[5], (d,))
        lnk_s = 1.0 + 0.1 * jax.random.normal(ks[6], (d,))
        lnk_b = 0.1 * jax.random.normal(ks[7], (d,))
        return wq, bq, wk, bk, lnq_s, lnq_b, lnk_s, lnk_b

    @pytest.mark.parametrize("use_ln", [True, False])
    @pytest.mark.parametrize("with_bias", [False, True])
    @pytest.mark.parametrize("gh,gw,ws,j", [(8, 8, 4, 4), (8, 8, 2, 2),
                                            (4, 8, 2, 2)])
    def test_matches_two_kernel_composition(self, rng, gh, gw, ws, j,
                                            with_bias, use_ln):
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            eva_attention_packed,
        )
        from efficient_attention_tpu.ops.pallas.eva_single import (
            eva_attention_single,
            supports_single,
        )
        from efficient_attention_tpu.ops.pallas.eva_summaries import (
            eva_summaries_packed,
        )

        Bp, nh, d = 2, 3, 16
        hd = nh * d
        N = gh * gw
        k1, k2 = jax.random.split(rng)
        qkv = jax.random.normal(k1, (Bp, N, 3 * hd))
        bias = (jax.random.normal(k2, (nh, ws * ws, ws * ws))
                if with_bias else None)
        wq, bq, wk, bk, lnq_s, lnq_b, lnk_s, lnk_b = self._params(d)
        scale = d ** -0.5
        proj = "default" if use_ln else "no-ln"
        assert supports_single(Bp, gh, gw, ws, j, proj, 3 * hd,
                               itemsize=4)

        ln = (lnq_s, lnq_b, lnk_s, lnk_b) if use_ln else (None,) * 4
        rf, bt = eva_summaries_packed(
            qkv, wq, bq, wk, bk, *ln, nh=nh, gw=gw, j=j, use_ln=use_ln,
            interpret=True)
        ref = eva_attention_packed(qkv, rf, bt, scale, nh, gw, ws,
                                   bias=bias, interpret=True)
        out = eva_attention_single(
            qkv, wq, bq, wk, bk, *ln, scale, nh, gw, ws, j, use_ln,
            bias=bias, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)

    @pytest.mark.parametrize("use_ln", [True, False])
    def test_twin_matches_kernel_and_grads_flow(self, rng, use_ln):
        """The pure-XLA twin (the custom-vjp backward fallback) computes
        the same function as the kernel, and grad-through-the-eval-path
        works (VJP falls back to the twin instead of a Mosaic AD error)."""
        from efficient_attention_tpu.ops.pallas.eva_single import (
            eva_attention_single,
        )

        Bp, nh, d, gh, gw, ws, j = 2, 3, 16, 8, 8, 4, 4
        hd = nh * d
        N = gh * gw
        qkv = jax.random.normal(rng, (Bp, N, 3 * hd))
        wq, bq, wk, bk, lnq_s, lnq_b, lnk_s, lnk_b = self._params(d)
        ln = (lnq_s, lnq_b, lnk_s, lnk_b) if use_ln else (None,) * 4
        scale = d ** -0.5

        def f(q):
            out = eva_attention_single(
                q, wq, bq, wk, bk, *ln, scale, nh, gw, ws, j, use_ln,
                interpret=True)
            return jnp.sum(out * out)

        val, g = jax.value_and_grad(f)(qkv)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(g)).all()

        # the custom-vjp wiring (nondiff-arg order, residual order) must
        # route to the twin's VJP at the same operand packing: rebuild the
        # packed operands exactly as eva_attention_single does and compare
        # against jax.grad of the twin directly.  (The twin's own autodiff
        # is plain jnp ops; its equality to the kernel FUNCTION is the
        # parity assertion below — f32 finite differences through the
        # interpret-mode kernel are too noisy to gate on.)
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            MASK_VAL,
            _strip_maps,
        )
        from efficient_attention_tpu.ops.pallas.eva_single import (
            _chunk_membership,
            _round8,
            eva_single_twin,
        )

        tgs = gw * ws
        ns = N // tgs
        C = (gh // j) * (gw // j)
        c8 = _round8(C)
        _, mask_add = _strip_maps(gw, ws, tgs)
        col = np.arange(c8)
        cmask = jnp.asarray(np.where(col < C, 0.0, MASK_VAL), jnp.float32)
        add_big = jnp.concatenate(
            [jnp.broadcast_to(mask_add, (nh, tgs, tgs)),
             jnp.broadcast_to(cmask, (nh, tgs, c8))], axis=-1)
        P = jnp.asarray(_chunk_membership(gh, gw, j, tgs, ns, c8))

        def blockdiag(w):
            out = jnp.zeros((hd, hd), jnp.float32)
            for h in range(nh):
                out = out.at[h * d:(h + 1) * d, h * d:(h + 1) * d].set(w)
            return out

        wq_big = jnp.zeros((3 * hd, hd)).at[:hd].set(blockdiag(wq))
        wk_big = jnp.zeros((3 * hd, hd)).at[hd:2 * hd].set(blockdiag(wk))
        tile = lambda v: jnp.tile(v, nh)  # noqa: E731
        lnt = (tuple(tile(t) for t in ln) if use_ln
               else (jnp.ones(hd), jnp.zeros(hd)) * 2)

        def f_twin(q):
            out = eva_single_twin(
                q, P, wq_big, tile(bq), wk_big, tile(bk), *lnt, add_big,
                scale=scale, nh=nh, j=j, use_ln=use_ln)
            return jnp.sum(out * out)

        v_twin, g_twin = jax.value_and_grad(f_twin)(qkv)
        np.testing.assert_allclose(float(val), float(v_twin),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_twin),
                                   rtol=1e-4, atol=1e-5)

    def test_gate_rejects_bad_geometry(self):
        from efficient_attention_tpu.ops.pallas.eva_single import (
            supports_single,
        )

        # window not dividing the grid
        assert not supports_single(2, 8, 8, 3, 4, "default", 144)
        # chunk not dividing the grid
        assert not supports_single(2, 8, 8, 4, 3, "default", 144)
        # a whole batch element no longer fits the VMEM budget
        assert not supports_single(8, 256, 256, 8, 8, "default", 2304)
        # adaptive_proj without summaries semantics
        assert not supports_single(2, 8, 8, 4, 4, "none", 144)


class TestEva1DKernel:
    """1-D halo'd + padding-masked EVA kernel (ops/pallas/eva_1d.py) — the
    WMT encoder configuration (VERDICT r2 item 5) — vs the module's XLA
    masked path, in interpreter mode."""

    def _run(self, rng, use_pad, use_t5, ws=8, N=64, Bp=2, dim=48, nh=3):
        from flax import linen as nn

        from efficient_attention_tpu.attention import EVA
        from efficient_attention_tpu.ops.pallas.eva_1d import (
            eva_attention_1d,
            supports_1d,
        )

        lm = max(1, N // 8)  # chunk size 8
        m = EVA(dim=dim, num_heads=nh, window_size=ws, num_landmarks=lm,
                attn_2d=False, overlap_window=True, use_t5_rpe=use_t5,
                use_rpe=not use_t5, adaptive_proj="no-ln", impl="xla")
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (Bp, N, dim))
        params = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        kpm = None
        lengths = None
        if use_pad:
            lengths = np.array([N, N - 11])
            kpm = jnp.asarray(
                np.arange(N)[None, :] >= lengths[:, None])
        ref = m.apply(params, x, key_padding_mask=kpm, deterministic=True)

        def pieces(mod, x, kpm):
            q, k, v = mod.proj_and_split_heads(x)
            B = x.shape[0]
            Nn = x.shape[1]
            rf_win = Nn // mod.num_landmarks
            if kpm is None:
                kpm2 = jnp.zeros((B, Nn), bool)
            else:
                kpm2 = kpm
            kf = kpm2.astype(q.dtype)[:, None, :, None]
            rf_w_q = mod.window_partition(q, (Nn,), window_size=rf_win,
                                          ext_window_size=mod.ext_size)
            rf_w_k = mod.window_partition(k, (Nn,), window_size=rf_win,
                                          ext_window_size=mod.ext_size)
            rf_w_v = mod.window_partition(v, (Nn,), window_size=rf_win,
                                          ext_window_size=mod.ext_size)
            rf_w_mask = mod.window_partition(
                kf, (Nn,), window_size=rf_win,
                ext_window_size=mod.ext_size, pad_val=1.0).astype(bool)
            rf_w_q = jnp.where(rf_w_mask, 0.0, rf_w_q)
            rf_w_k = jnp.where(rf_w_mask, 0.0, rf_w_k)
            rf_w_v = jnp.where(rf_w_mask, 0.0, rf_w_v)
            rf_k_bar = mod.adaptive_mu_k(jnp.mean(rf_w_k, axis=-2))
            rf_q_bar = mod.adaptive_mu_q(jnp.mean(rf_w_q, axis=-2))
            mu = 0.5 * (rf_q_bar + rf_k_bar)
            from efficient_attention_tpu.attention.base import MASK_VAL
            from efficient_attention_tpu.ops.random_features import (
                prm_projection,
            )

            lp = prm_projection(rf_w_k, mu[..., None, :],
                                normalize=False)[..., 0, :]
            lp = jnp.where(rf_w_mask[..., 0], MASK_VAL, lp)
            beta = jnp.einsum("...cj,...cjd->...cd",
                              jax.nn.softmax(lp, axis=-1), rf_w_v)
            bias = None
            if mod.use_t5_rpe:
                bias = mod.rel_pos_bias(
                    mod.window_size,
                    mod.window_size + 2 * mod.ext_size)[0, :, 0]
            elif mod.rpe_enabled:
                bias = mod.local_relative_position_bias_table
            return q, k, v, rf_k_bar, beta, bias

        q, k, v, rf, beta, bias = nn.apply(pieces, m)(params, x, kpm)
        B = x.shape[0]
        hd = dim

        def pack(t):
            return jnp.swapaxes(t, 1, 2).reshape(B, N, hd)

        qkv_p = jnp.concatenate([pack(q), pack(k), pack(v)], -1)
        rf_p = jnp.swapaxes(rf, 1, 2).reshape(B, rf.shape[2], hd)
        bt_p = jnp.swapaxes(beta, 1, 2).reshape(B, beta.shape[2], hd)
        assert supports_1d(B, N, ws, rf.shape[2])
        out = eva_attention_1d(
            qkv_p, rf_p, bt_p, kpm, m.scale, nh, ws, m.ext_size,
            bias=bias, n_orig=N, interpret=True)

        def outproj(mod, o):
            return mod.proj(o)

        got = nn.apply(outproj, m)(params, out)
        ref_n = np.asarray(ref)
        got_n = np.asarray(got)
        if lengths is not None:
            for b, L in enumerate(lengths):
                np.testing.assert_allclose(got_n[b, :L], ref_n[b, :L],
                                           atol=3e-5, rtol=1e-4)
        else:
            np.testing.assert_allclose(got_n, ref_n, atol=3e-5, rtol=1e-4)

    def test_no_padding_t5(self, rng):
        self._run(rng, use_pad=False, use_t5=True)

    def test_padding_t5(self, rng):
        self._run(rng, use_pad=True, use_t5=True)

    def test_padding_learned_rpe(self, rng):
        self._run(rng, use_pad=True, use_t5=False)


class TestLaraFusedKernel:
    """Fused LARA SNIS kernel (ops/pallas/lara_fused.py) vs the module's
    reference-shaped XLA composition, interpret mode (CPU)."""

    def _module(self, impl, proposal_gen="pool-mixed", landmarks=16):
        from efficient_attention_tpu.attention.lara import LinearRA

        return LinearRA(dim=128, num_heads=2, num_landmarks=landmarks,
                        proposal_gen=proposal_gen, mis_type="mis-opt",
                        impl=impl)

    @pytest.mark.parametrize("proposal_gen", ["pool-mixed", "pool",
                                              "no-param-pool"])
    def test_matches_xla_2d(self, rng, proposal_gen):
        x = jax.random.normal(rng, (2, 8, 8, 128))
        m_xla = self._module("xla", proposal_gen)
        m_fus = self._module("fused", proposal_gen)
        params = m_xla.init(jax.random.PRNGKey(0), x, deterministic=True)
        ref = m_xla.apply(params, x, deterministic=True)
        out = m_fus.apply(params, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_matches_xla_1d(self, rng):
        x = jax.random.normal(rng, (2, 64, 128))
        m_xla = self._module("xla", "adaptive-1d")
        m_fus = self._module("fused", "adaptive-1d")
        params = m_xla.init(jax.random.PRNGKey(0), x, deterministic=True)
        ref = m_xla.apply(params, x, deterministic=True)
        out = m_fus.apply(params, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_twin_matches_kernel_and_grads_flow(self, rng):
        """The XLA twin (custom-vjp fallback) computes the same function;
        grads through the fused path are finite and equal the twin's."""
        from efficient_attention_tpu.ops.pallas.lara_fused import (
            lara_attention_fused,
            lara_fused_twin,
            _round8,
        )

        B, H, d, N, c = 2, 2, 64, 64, 16
        hd = H * d
        ks = jax.random.split(rng, 5)
        qkv = jax.random.normal(ks[0], (B, N, 3 * hd))
        w = jax.random.normal(ks[1], (B, H, c, d)) * 0.5
        qb = jax.random.normal(ks[2], (B, H, c, d)) * 0.5
        bal = jax.nn.softmax(jax.random.normal(ks[3], (B, H, c)), -1)
        lp = jax.random.normal(ks[4], (B, H, c))
        scale = d ** -0.5

        def f_kernel(q):
            out = lara_attention_fused(q, w, qb, bal, lp, scale, H,
                                       interpret=True)
            return jnp.sum(out * out)

        c8 = _round8(c)

        def pack(t):
            t2 = jnp.swapaxes(t, 1, 2).reshape(B, c, hd)
            return jnp.pad(t2, ((0, 0), (0, c8 - c), (0, 0)))

        def pack_sc(t):
            t2 = jnp.swapaxes(t, 1, 2)
            return jnp.pad(t2, ((0, 0), (0, c8 - c), (0, 0)))

        def f_twin(q):
            out = lara_fused_twin(q, pack(w), pack(qb), pack_sc(bal),
                                  pack_sc(lp), scale=scale, nh=H, c=c,
                                  alpha_coeff=1.0)
            return jnp.sum(out * out)

        vk, gk = jax.value_and_grad(f_kernel)(qkv)
        vt, gt = jax.value_and_grad(f_twin)(qkv)
        np.testing.assert_allclose(float(vk), float(vt),
                                   rtol=1e-5, atol=1e-5)
        assert np.isfinite(np.asarray(gk)).all()
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gt),
                                   rtol=1e-4, atol=1e-5)


class TestPerformerFusedKernel:
    """Fused FAVOR+ kernel (ops/pallas/performer_fused.py) vs the module's
    reference-shaped XLA composition, interpret mode (CPU)."""

    def _module(self, impl, sample_scheme="default"):
        from efficient_attention_tpu.attention.kernelized import (
            KernelizedAttention,
        )

        return KernelizedAttention(dim=128, num_heads=2, approx_attn_dim=64,
                                   sample_scheme=sample_scheme, impl=impl)

    @pytest.mark.parametrize("sample_scheme", ["default", "learnable"])
    def test_matches_xla_2d(self, rng, sample_scheme):
        x = jax.random.normal(rng, (2, 8, 8, 128))
        m_xla = self._module("xla", sample_scheme)
        m_fus = self._module("fused", sample_scheme)
        params = m_xla.init(jax.random.PRNGKey(0), x, deterministic=True)
        ref = m_xla.apply(params, x, deterministic=True)
        out = m_fus.apply(params, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_matches_xla_1d(self, rng):
        x = jax.random.normal(rng, (2, 64, 128))
        m_xla = self._module("xla")
        m_fus = self._module("fused")
        params = m_xla.init(jax.random.PRNGKey(0), x, deterministic=True)
        ref = m_xla.apply(params, x, deterministic=True)
        out = m_fus.apply(params, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_fused_refuses_padding_mask(self, rng):
        x = jax.random.normal(rng, (2, 64, 128))
        mask = jnp.zeros((2, 64), bool).at[:, 48:].set(True)
        m_fus = self._module("fused")
        params = m_fus.init(jax.random.PRNGKey(0), x, deterministic=True)
        with pytest.raises(NotImplementedError):
            m_fus.apply(params, x, mask, deterministic=True)

    def test_twin_matches_kernel_and_grads_flow(self, rng):
        """The XLA twin (custom-vjp fallback) computes the same function;
        grads through the fused path are finite and equal the twin's."""
        from efficient_attention_tpu.ops.pallas.performer_fused import (
            performer_attention_fused,
            performer_fused_twin,
        )

        B, H, d, N, m = 2, 2, 64, 64, 64
        hd = H * d
        ks = jax.random.split(rng, 2)
        qkv = jax.random.normal(ks[0], (B, N, 3 * hd))
        proj = jax.random.normal(ks[1], (H, m, d))

        def f_kernel(q):
            out = performer_attention_fused(q, proj, H, interpret=True)
            return jnp.sum(out * out)

        w_p = proj.transpose(1, 0, 2).reshape(m, hd).astype(jnp.float32)

        def f_twin(q):
            return jnp.sum(performer_fused_twin(q, w_p, nh=H) ** 2)

        vk, gk = jax.value_and_grad(f_kernel)(qkv)
        vt, gt = jax.value_and_grad(f_twin)(qkv)
        np.testing.assert_allclose(float(vk), float(vt),
                                   rtol=1e-5, atol=1e-5)
        assert np.isfinite(np.asarray(gk)).all()
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gt),
                                   rtol=1e-4, atol=1e-5)
