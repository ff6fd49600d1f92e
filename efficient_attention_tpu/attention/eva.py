"""EVA: control-variate fusion of exact local attention and RF global attention.

TPU-native rebuild of ``efficient-attention/efficient_attention/eva.py``
(ICLR 2023, "Efficient Attention via Control Variates").  The algorithm:

  1. blocked local attention over windows (optionally halo'd),
  2. chunked random-feature global attention: per-chunk adaptive proposal
     ``mu = (mu_q(mean q) + mu_k(mean k)) / 2``, one RF sample ``w ~ N(mu, I)``
     (mean at eval), per-chunk SNIS value summary ``beta``,
  3. a *single* softmax over the concatenation of local logits and per-chunk
     RF logits, so the control-variate correction and the normalizer fuse
     (``eva.py:222-227``).

The whole forward is per-(batch, head, window) block-local with a tiny
``[c, d]`` broadcast of ``rf_k_bar``/``beta`` — exactly the structure the
fused Pallas kernel exploits (see ``ops/pallas/eva_kernel.py``).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efficient_attention_tpu.attention.base import MASK_VAL, trunc_normal_init
from efficient_attention_tpu.attention.local import LocalAttention
from efficient_attention_tpu.ops.random_features import prm_projection
from efficient_attention_tpu.ops.rpe import t5_bucket_table

Array = jax.Array


from efficient_attention_tpu.attention.base import on_tpu as _on_tpu


class T5RelativePositionBias(nn.Module):
    """Bucketed per-head relative position bias (``eva.py:15-65``).

    The bucket table is static for fixed (i, j) so it is precomputed in numpy
    and folded into the compiled program.
    """

    scale: float
    num_heads: int
    causal: bool = False
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, i: int, j: int, k_offset: int = 0) -> Array:
        table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(stddev=1.0),
            (self.num_buckets, self.num_heads),
        )
        buckets = t5_bucket_table(
            i, j, causal=self.causal, num_buckets=self.num_buckets,
            max_distance=self.max_distance, k_offset=k_offset,
        )
        bias = jnp.take(table, jnp.asarray(buckets.reshape(-1)), axis=0)
        bias = bias.reshape(i, j, self.num_heads)
        bias = jnp.transpose(bias, (2, 0, 1))[None, :, None]  # [1, h, 1, i, j]
        return bias * self.scale


class EVA(LocalAttention):
    """EVA attention (``eva.py:68-243``).

    Extra args over :class:`LocalAttention`:
      * ``adaptive_proj``: ``default`` (Linear+LN) / ``no-ln`` / ``none``
        (``eva.py:78-98``)
      * ``num_landmarks``: number of global RF chunks (``eva.py:118``)
      * ``use_t5_rpe``: T5-style local bias instead of learned-table RPE
    """

    adaptive_proj: str = "default"
    num_landmarks: int = 49
    use_t5_rpe: bool = False
    # 'auto' prefers the packed zero-transpose Pallas kernel on TPU when the
    # layout allows (2-D square windows, no padding mask, no halo), falling
    # back to the Swin-layout kernel, then the XLA einsum path.
    # 'packed'/'pallas'/'rowmajor' force a specific kernel (error if
    # unsupported); 'xla' forces the reference einsum path.
    impl: str = "auto"
    # eval-path micro-kernel toggles — measured per-config on v5e
    # (scripts/bench_eva_eval_paths.py): at the bench geometry BOTH default
    # to OFF because XLA's producer fusions beat the extra custom-call
    # boundaries (module 1.64 ms baseline vs 1.73 fused-out / 1.77 summary-
    # kernel / 1.90 both).  They remain available for geometries where the
    # strided-reduce summaries dominate
    use_pallas_summaries: bool = False
    fuse_output_proj: bool = False
    # sequence/context parallelism (mesh axis name): run inside shard_map
    # with tokens sharded along that axis — local windows stay on-shard and
    # only the tiny [c, d] chunk summaries are all-gathered
    # (parallel/seq_parallel.py).  Non-causal EVA has NO position-dependent
    # state (window RPE is window-local, every chunk is visible to every
    # query), so the shard computation is exactly a slice of the global one.
    # Requires: no halo, no padding mask, shard grid divisible by window
    # and chunk sizes
    seq_axis: Optional[str] = None
    # megakernel eval path: BOTH kernels read x (38.5MB at the bench
    # geometry) instead of qkv (115MB) and recompute the projection on the
    # MXU in-kernel (ops/pallas/eva_mega.py).  Measured SLOWER in-module on
    # v5e (2.19 vs 1.64 ms/layer) despite moving ~4x fewer bytes — Pallas
    # reads on this toolchain stream at ~1/4 of XLA's copy bandwidth, so
    # the extra custom-call boundary + in-kernel projection lose to XLA's
    # producer fusions; kept as a measured, parity-tested opt-in
    use_megakernel: bool = False
    # single-pass eval path: ONE pallas_call computes the chunk summaries
    # into VMEM scratch AND the joint local/chunk softmax from a resident
    # [RB, N, 3HD] qkv block (ops/pallas/eva_single.py) — qkv streams from
    # HBM exactly once and the summaries never round-trip HBM, removing
    # the two round-3 measured killers (double qkv traffic + an extra
    # custom-call boundary) in one design.  Default ON since the round-5
    # race: 1.26-1.33 vs the two-kernel packed path's 1.33-1.63 ms/layer
    # in-module at the bench geometry (B=128 bf16 DeiT-tiny-p8), f32
    # on-chip parity 1e-4
    use_single_kernel: bool = True

    def setup(self):
        self._setup_projections()
        self._setup_rpe()
        if self.use_rpe and self.use_t5_rpe:
            raise NotImplementedError(
                "Default RPE and T5-style RPE cannot be enabled simultaneously."
            )
        if self.adaptive_proj in ("default", "no-ln"):
            layers = [nn.Dense(self.head_dim, kernel_init=trunc_normal_init,
                               bias_init=nn.initializers.zeros)]
            if self.adaptive_proj == "default":
                layers.append(nn.LayerNorm())
            self.adaptive_mu_q = nn.Sequential(layers, name="adaptive_mu_q")
            layers_k = [nn.Dense(self.head_dim, kernel_init=trunc_normal_init,
                                 bias_init=nn.initializers.zeros)]
            if self.adaptive_proj == "default":
                layers_k.append(nn.LayerNorm())
            self.adaptive_mu_k = nn.Sequential(layers_k, name="adaptive_mu_k")
        elif self.adaptive_proj == "none":
            self.adaptive_mu_k = nn.Sequential(
                [nn.Dense(self.head_dim, kernel_init=trunc_normal_init,
                          bias_init=nn.initializers.zeros), nn.LayerNorm()],
                name="adaptive_mu_k",
            )
        else:
            raise NotImplementedError(f"adaptive_proj={self.adaptive_proj}")
        if self.use_t5_rpe:
            self.rel_pos_bias = T5RelativePositionBias(
                scale=self.scale,
                num_heads=self.num_heads,
                causal=False,
                num_buckets=max(min((self.window_size + self.ext_size) // 2, 64), 16),
                max_distance=self.window_size + self.ext_size,
            )

    def _summaries_dispatch(self, qkv, seq_shape, rf_win_size,
                            deterministic):
        """Route chunk summaries to the Pallas kernel when enabled.

        The kernel (``ops/pallas/eva_summaries.py``) reads qkv once where
        XLA's strided 6-D reductions re-read it — but measured IN-MODULE it
        is slightly slower than XLA's fused form at the bench geometry
        (see the class toggle comments), so it is opt-in.  Eval-only: the
        training form's VJP needs the matmul formulation; and during flax
        init the XLA path must run so the adaptive-proj parameters are
        created.
        """
        gh, gw = seq_shape
        if (deterministic and not self.is_initializing() and _on_tpu()
                and self.use_pallas_summaries
                and self.adaptive_proj in ("default", "no-ln")):
            from efficient_attention_tpu.ops.pallas.eva_summaries import (
                eva_summaries_packed,
                supports_summaries,
            )

            if supports_summaries(qkv.shape[0], gh, gw, rf_win_size,
                                  self.adaptive_proj):
                pq = self.adaptive_mu_q.variables["params"]
                pk = self.adaptive_mu_k.variables["params"]
                use_ln = self.adaptive_proj == "default"
                ln = (lambda p, k: p["layers_1"][k] if use_ln else None)
                return eva_summaries_packed(
                    qkv,
                    pq["layers_0"]["kernel"], pq["layers_0"]["bias"],
                    pk["layers_0"]["kernel"], pk["layers_0"]["bias"],
                    ln(pq, "scale"), ln(pq, "bias"),
                    ln(pk, "scale"), ln(pk, "bias"),
                    nh=self.num_heads, gw=gw, j=rf_win_size, use_ln=use_ln)
        return self._chunk_summaries_packed(
            qkv, seq_shape, rf_win_size, deterministic)

    def _chunk_summaries_packed(self, qkv, seq_shape, rf_win_size,
                                deterministic):
        """Chunk summaries read straight from the packed ``[B, N, 3*H*D]``
        projection output; returns ``(rf_k_bar, beta)`` packed ``[B, C, H*D]``
        (the layout :func:`eva_attention_packed` consumes).

        Two equivalent formulations, dispatched on ``deterministic``:
        training routes every chunk reduction through a STATIC 0/1 chunk-
        membership matrix ``P [C, N]`` so both directions are plain matmuls
        (6-D strided-einsum VJPs cost ~10x their forward on TPU); inference
        uses the 6-D strided-reduce form, which XLA fuses into the qkv
        producer (measured IN-MODULE 1.66 vs 2.08 ms/layer in round 2 —
        note the matmul form wins when stage-timed in isolation, 0.70 vs
        0.87 ms, but loses fused; trust the in-module number).  Math
        identical to the partitioned path (``eva.py:150-196``);
        ``adaptive_mu_*`` parameters are shared (Dense/LN act on the minor
        head_dim axis).
        """
        nh = self.num_heads
        d = self.head_dim
        hd = nh * d
        B, N, _ = qkv.shape
        j = rf_win_size
        gh, gw = seq_shape
        hc, wc = gh // j, gw // j
        c = hc * wc

        # static chunk membership [C, N]: token (y, x) -> chunk (y//j, x//j)
        t = np.arange(N)
        chunk_of = (t // (gw * j)) * wc + (t % gw) // j
        P = jnp.asarray(
            chunk_of[None, :] == np.arange(c)[:, None], qkv.dtype)
        P_mean = P / float(j * j)

        qf = qkv[:, :, :hd]
        kf = qkv[:, :, hd:2 * hd]
        vf = qkv[:, :, 2 * hd:]

        # In f32 the default MXU precision truncates operands to bf16, which
        # drifts k_mean ~1.5e-4 from an exact mean (amplified to ~8e-3 in
        # rf_k_bar by the adaptive-proj LayerNorm) and breaks the "math
        # identical to the partitioned path" contract; HIGHEST restores
        # ~1e-9 parity.  bf16 inputs have nothing to preserve, so keep the
        # fast single-pass MXU mode there.
        prec = (jax.lax.Precision.HIGHEST if qkv.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        k_mean = jnp.einsum("cn,bnf->bcf", P_mean, kf,
                            precision=prec).reshape(B, c, nh, d)
        if self.adaptive_proj in ("default", "no-ln"):
            q_mean = jnp.einsum("cn,bnf->bcf", P_mean, qf,
                                precision=prec).reshape(B, c, nh, d)
            rf_q_bar = self.adaptive_mu_q(q_mean)
            rf_k_bar = self.adaptive_mu_k(k_mean)
            mu = 0.5 * (rf_q_bar + rf_k_bar)
        else:
            rf_k_bar = self.adaptive_mu_k(k_mean)
            mu = jnp.zeros_like(rf_k_bar)
        weights = self._sample_weights(mu, deterministic)  # [B, C, nh, d]

        dn = d ** -0.5
        if deterministic:
            # inference: the 6-D strided-reduce form fuses into the qkv
            # producer (faster in-module; see docstring) and its VJP never
            # runs
            qkv7 = qkv.reshape(B, gh, gw, 3, nh, d)
            k7 = qkv7[:, :, :, 1].reshape(B, hc, j, wc, j, nh, d)
            v7 = qkv7[:, :, :, 2].reshape(B, hc, j, wc, j, nh, d)
            w5 = weights.reshape(B, hc, wc, nh, d)
            dash = dn * jnp.einsum("zaicjhd,zachd->zaicjh", k7, w5,
                                   preferred_element_type=jnp.float32)
            norm = (0.5 * dn) * jnp.sum(
                jnp.square(k7.astype(jnp.float32)), axis=-1)
            logp = dash - norm  # [B, hc, j, wc, j, nh]
            m = jnp.max(logp, axis=(2, 4), keepdims=True)
            p = jnp.exp(logp - m)
            p = p / jnp.sum(p, axis=(2, 4), keepdims=True)
            beta = jnp.einsum("zaicjh,zaicjhd->zachd", p.astype(qkv.dtype),
                              v7)
            return (rf_k_bar.reshape(B, c, hd), beta.reshape(B, c, hd))

        # training: log phi(k)[n] = <w_chunk(n), k_n>/sqrt(d)
        #                           - |k_n|^2/(2 sqrt(d))
        w_tok = jnp.einsum("cn,bcf->bnf", P,
                           weights.reshape(B, c, hd))  # [B, N, HD]
        k4 = kf.reshape(B, N, nh, d).astype(jnp.float32)
        dash = dn * jnp.sum(
            k4 * w_tok.reshape(B, N, nh, d).astype(jnp.float32), axis=-1)
        norm = (0.5 * dn) * jnp.sum(jnp.square(k4), axis=-1)
        logp = dash - norm  # [B, N, nh]
        # stable per-chunk softmax over member tokens: the chunk max is a
        # tiny strided reduction (its VJP is an elementwise select)
        m_c = jnp.max(
            logp.reshape(B, hc, j, wc, j, nh), axis=(2, 4))  # [B,hc,wc,nh]
        m_tok = jnp.einsum("cn,bch->bnh", P, m_c.reshape(B, c, nh))
        p = jnp.exp(logp - m_tok)  # [B, N, nh]
        denom = jnp.einsum("cn,bnh->bch", P, p)  # [B, C, nh]
        pv = (p[..., None].astype(qkv.dtype)
              * vf.reshape(B, N, nh, d)).reshape(B, N, hd)
        beta = jnp.einsum("cn,bnf->bcf", P, pv).reshape(B, c, nh, d)
        beta = (beta / denom[..., None]).astype(qkv.dtype)
        return (rf_k_bar.reshape(B, c, hd), beta.reshape(B, c, hd))

    def _forward_mega(self, x, seq_shape, rf_win_size):
        """Megakernel eval path (``ops/pallas/eva_mega.py``): summaries and
        attention both consume x directly; qkv never lands in HBM."""
        from efficient_attention_tpu.ops.pallas.eva_mega import (
            eva_attention_from_x,
            eva_summaries_from_x,
        )

        B = x.shape[0]
        C = x.shape[-1]
        gh, gw = seq_shape
        N = gh * gw
        xf = x.reshape(B, N, C)
        qv = self.qkv.variables["params"]
        b_qkv = qv.get("bias")
        if b_qkv is None:
            b_qkv = jnp.zeros((qv["kernel"].shape[1],), jnp.float32)
        pq = self.adaptive_mu_q.variables["params"]
        pk = self.adaptive_mu_k.variables["params"]
        use_ln = self.adaptive_proj == "default"
        ln = (lambda p, k: p["layers_1"][k] if use_ln else None)
        rf_k_bar, beta = eva_summaries_from_x(
            xf, qv["kernel"], b_qkv,
            pq["layers_0"]["kernel"], pq["layers_0"]["bias"],
            pk["layers_0"]["kernel"], pk["layers_0"]["bias"],
            ln(pq, "scale"), ln(pq, "bias"), ln(pk, "scale"), ln(pk, "bias"),
            nh=self.num_heads, gw=gw, j=rf_win_size, use_ln=use_ln)
        pp = self.proj.variables["params"]
        out = eva_attention_from_x(
            xf, qv["kernel"], b_qkv, rf_k_bar, beta,
            pp["kernel"], pp["bias"], self.scale, self.num_heads, gw,
            self.window_size, bias=self._window_bias_general())
        x = out.reshape((B,) + tuple(seq_shape) + (C,))
        return self.proj_dropout(x, deterministic=True)

    def _forward_single(self, x, seq_shape, rf_win_size, deterministic):
        """Single-pass eval path (``ops/pallas/eva_single.py``): summaries
        and joint attention in ONE kernel over a VMEM-resident qkv block."""
        from efficient_attention_tpu.ops.pallas.eva_single import (
            eva_attention_single,
        )

        B = x.shape[0]
        C = x.shape[-1]
        gh, gw = seq_shape
        N = gh * gw
        qkv = self.qkv(x.reshape(B, N, C))  # [B, N, 3*H*D]
        pq = self.adaptive_mu_q.variables["params"]
        pk = self.adaptive_mu_k.variables["params"]
        use_ln = self.adaptive_proj == "default"
        ln = (lambda p, k: p["layers_1"][k] if use_ln else None)
        out = eva_attention_single(
            qkv,
            pq["layers_0"]["kernel"], pq["layers_0"]["bias"],
            pk["layers_0"]["kernel"], pk["layers_0"]["bias"],
            ln(pq, "scale"), ln(pq, "bias"), ln(pk, "scale"), ln(pk, "bias"),
            self.scale, self.num_heads, gw, self.window_size, rf_win_size,
            use_ln, bias=self._window_bias_general())
        x = self.proj(out.reshape((B,) + tuple(seq_shape) + (C,)))
        return self.proj_dropout(x, deterministic=deterministic)

    def _forward_packed(self, x, seq_shape, rf_win_size, deterministic):
        """Zero-transpose EVA forward: LN'd tokens -> fused qkv projection ->
        packed Pallas kernel -> output projection, with no head transpose or
        window partition anywhere (see ``ops/pallas/eva_packed.py``)."""
        from efficient_attention_tpu.ops.pallas.eva_packed import (
            eva_attention_packed,
        )

        B = x.shape[0]
        C = x.shape[-1]
        gh, gw = seq_shape
        N = gh * gw
        qkv = self.qkv(x.reshape(B, N, C))  # [B, N, 3*H*D]
        rf_k_bar, beta = self._summaries_dispatch(
            qkv, seq_shape, rf_win_size, deterministic)
        bias = self._window_bias_general()
        if (deterministic and not self.is_initializing()
                and self.fuse_output_proj):
            # eval: the output projection is fused into the kernel so the
            # intermediate [B, N, H*D] never round-trips HBM (no VJP needed)
            from efficient_attention_tpu.ops.pallas.eva_packed import (
                eva_attention_packed_out,
            )

            pp = self.proj.variables["params"]
            out = eva_attention_packed_out(
                qkv, rf_k_bar, beta, pp["kernel"], pp["bias"], self.scale,
                self.num_heads, gw, self.window_size, bias=bias)
            x = out.reshape((B,) + tuple(seq_shape) + (C,))
            return self.proj_dropout(x, deterministic=deterministic)
        out = eva_attention_packed(
            qkv, rf_k_bar, beta, self.scale, self.num_heads, gw,
            self.window_size, bias=bias)
        x = self.proj(out.reshape((B,) + tuple(seq_shape) + (C,)))
        return self.proj_dropout(x, deterministic=deterministic)

    def _window_bias_general(self):
        """Per-window local bias ``[H, S, S]`` or None (RPE or T5)."""
        ws = self.window_size
        if self.use_t5_rpe:
            i = j = ws * ws if self.attn_2d else ws
            return self.rel_pos_bias(i, j)[0, :, 0]
        if self.rpe_enabled:
            if self.attn_2d:
                bias = jnp.take(
                    self.local_relative_position_bias_table,
                    self._rpe_index, axis=0,
                ).reshape(ws * ws, ws * ws, self.num_heads)
                return jnp.transpose(bias, (2, 0, 1))
            return self.local_relative_position_bias_table
        return None

    def _sample_weights(self, mu: Array, deterministic: bool) -> Array:
        """One RF sample ``w ~ N(mu, I)`` (mean at eval; ``eva.py:187-190``)."""
        if deterministic:
            return mu
        noise = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
        return mu + noise

    def _chunk_summaries_natural(self, q, k, v, seq_shape, rf_win_size,
                                 deterministic):
        """Chunk summaries ``(rf_k_bar, beta)`` without window partitions.

        Equivalent to the partitioned path with an all-False padding mask
        (``eva.py:150-196``), but every op reads q/k/v in their natural
        ``[b, h, n, d]`` layout through free reshapes: chunk means are
        strided reductions and the prm/SNIS contractions write only tiny
        ``[b, h, c, j]`` / ``[b, h, c, d]`` outputs, so no transposed copy
        of a full tensor is materialized in HBM.
        """
        nh = self.num_heads
        d = self.head_dim
        B = q.shape[0]
        j = rf_win_size
        if self.attn_2d:
            gh, gw = seq_shape
            hc, wc = gh // j, gw // j
            c = hc * wc

            def chunked(t):
                # [b, h, n, d] -> [b, h, hc, j, wc, j, d] (free reshape)
                return t.reshape(B, nh, hc, j, wc, j, d)

            k6 = chunked(k)
            k_mean = jnp.mean(k6, axis=(3, 5)).reshape(B, nh, c, d)
            if self.adaptive_proj in ("default", "no-ln"):
                q_mean = jnp.mean(chunked(q), axis=(3, 5)).reshape(B, nh, c, d)
                rf_q_bar = self.adaptive_mu_q(q_mean)
                rf_k_bar = self.adaptive_mu_k(k_mean)
                mu = 0.5 * (rf_q_bar + rf_k_bar)
            else:
                rf_k_bar = self.adaptive_mu_k(k_mean)
                mu = jnp.zeros_like(rf_k_bar)
            weights = self._sample_weights(mu, deterministic)
            w6 = weights.reshape(B, nh, hc, wc, d)
            # log phi(k)[c, j] = <w_c, k_j>/sqrt(d) - |k_j|^2/(2 sqrt(d))
            # (``attn_utils.py:292-348``), per 2-D chunk (a, b2)
            dn = d ** -0.5
            dash = dn * jnp.einsum("bhaicjd,bhacd->bhaicj", k6, w6,
                                   preferred_element_type=jnp.float32)
            norm = (0.5 * dn) * jnp.sum(
                jnp.square(k6.astype(jnp.float32)), axis=-1)
            logp = dash - norm  # [b, h, hc, j, wc, j]
            m = jnp.max(logp, axis=(3, 5), keepdims=True)
            p = jnp.exp(logp - m)
            p = p / jnp.sum(p, axis=(3, 5), keepdims=True)
            beta = jnp.einsum("bhaicj,bhaicjd->bhacd", p.astype(v.dtype),
                              chunked(v)).reshape(B, nh, c, d)
            return rf_k_bar, beta

        # 1-D: the chunk partition is itself a free reshape
        c = q.shape[2] // j
        k4 = k.reshape(B, nh, c, j, d)
        k_mean = jnp.mean(k4, axis=-2)
        if self.adaptive_proj in ("default", "no-ln"):
            q_mean = jnp.mean(q.reshape(B, nh, c, j, d), axis=-2)
            rf_q_bar = self.adaptive_mu_q(q_mean)
            rf_k_bar = self.adaptive_mu_k(k_mean)
            mu = 0.5 * (rf_q_bar + rf_k_bar)
        else:
            rf_k_bar = self.adaptive_mu_k(k_mean)
            mu = jnp.zeros_like(rf_k_bar)
        weights = self._sample_weights(mu, deterministic)
        log_proj_w_k = prm_projection(
            k4, weights[..., None, :], normalize=False)[..., 0, :]
        beta = jnp.einsum(
            "...cj,...cjd->...cd",
            jax.nn.softmax(log_proj_w_k, axis=-1),
            v.reshape(B, nh, c, j, d))
        return rf_k_bar, beta

    def __call__(
        self,
        x: Array,
        key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        """EVA forward (``eva.py:138-233``)."""
        B = x.shape[0]
        C = x.shape[-1]
        orig_n = math.prod(x.shape[1:-1])
        if self.attn_2d:
            seq_shape = x.shape[1:-1]
            assert len(seq_shape) == 2
            if self.window_size > 0:
                assert seq_shape[0] % self.window_size == 0
                assert seq_shape[1] % self.window_size == 0
        else:
            x = x.reshape(B, orig_n, C)
            if self.window_size > 0:
                from efficient_attention_tpu.ops import windows as W

                x = W.pad_to_multiple(x, self.window_size, axis=-2)
                N = x.shape[-2]
                if key_padding_mask is None:
                    if N != orig_n:
                        key_padding_mask = W.padding_mask_for(B, orig_n, N)
                else:
                    key_padding_mask = W.pad_to_multiple(
                        key_padding_mask, self.window_size, axis=-1, value=True
                    )
            seq_shape = (x.shape[-2],)
        N = math.prod(seq_shape)

        padding_free = key_padding_mask is None

        # num_landmarks is a GLOBAL budget: under sequence parallelism the
        # module sees only its shard, so the chunk size derives from the
        # global length (axis sizes are static inside shard_map)
        n_global = N
        if self.seq_axis is not None:
            n_global = N * jax.lax.axis_size(self.seq_axis)
        if self.attn_2d:
            rf_win_size = int(math.sqrt(n_global // self.num_landmarks))
        else:
            rf_win_size = int(n_global // self.num_landmarks)
        if rf_win_size == 0:
            raise ValueError(
                f"num_landmarks={self.num_landmarks} exceeds the "
                f"(padded) sequence length {N}; the RF chunk size would be "
                "0 (the reference fails the same way, reference "
                "eva.py:155-158)")

        # ---- packed zero-transpose path (preferred on TPU) ----
        if (self.impl in ("auto", "packed")
                and self.attn_2d
                and padding_free
                and self.ext_size == 0
                and self.attn_drop == 0.0
                and self.seq_axis is None
                and _on_tpu()):
            from efficient_attention_tpu.ops.pallas.eva_packed import (
                supports_packed,
            )

            gh, gw = seq_shape
            ws_ = self.window_size
            chunk_ok = (rf_win_size > 0
                        and rf_win_size * rf_win_size * self.num_landmarks
                        == N
                        and gh % rf_win_size == 0 and gw % rf_win_size == 0)
            if (ws_ > 0 and gh % ws_ == 0 and gw % ws_ == 0 and chunk_ok
                    and supports_packed(B, N, gw, ws_,
                                        c=self.num_landmarks)):
                from efficient_attention_tpu.ops.pallas.eva_summaries import (
                    supports_summaries,
                )

                if (deterministic and not self.is_initializing()
                        and self.use_single_kernel):
                    from efficient_attention_tpu.ops.pallas.eva_single import (
                        supports_single,
                    )

                    if supports_single(B, gh, gw, ws_, rf_win_size,
                                       self.adaptive_proj, 3 * C,
                                       x.dtype.itemsize):
                        return self._forward_single(
                            x, seq_shape, rf_win_size, deterministic)
                if (deterministic and not self.is_initializing()
                        and self.use_megakernel
                        and self.adaptive_proj in ("default", "no-ln")
                        and supports_summaries(B, gh, gw, rf_win_size,
                                               self.adaptive_proj)):
                    return self._forward_mega(x, seq_shape, rf_win_size)
                return self._forward_packed(
                    x, seq_shape, rf_win_size, deterministic)
            if self.impl == "packed":
                raise ValueError(
                    "impl='packed' requires 2-D square windows dividing the "
                    "grid, square chunks, no halo/padding mask, on TPU")
        elif self.impl == "packed":
            raise ValueError(
                "impl='packed' requires attn_2d, no padding mask, no halo, "
                "attn_drop=0, on TPU")

        if self.impl == "pallas":
            # validate the Swin-kernel geometry BEFORE any real compute so
            # a strict request fails fast (window count/size are static)
            from efficient_attention_tpu.ops.pallas.eva_kernel import (
                supports_shapes,
            )

            ws_ = self.window_size
            g_count = (N // (ws_ * ws_)) if self.attn_2d else (N // ws_)
            s_size = ws_ * ws_ if self.attn_2d else ws_
            if not (padding_free and self.ext_size == 0
                    and self.attn_drop == 0.0 and _on_tpu()
                    and ws_ > 0 and supports_shapes(B, g_count, s_size)):
                raise ValueError(
                    "impl='pallas' requires TPU, no halo, and no padding "
                    "mask")

        q, k, v = self.proj_and_split_heads(x)

        if padding_free and self.ext_size == 0:
            # ---- natural-layout chunk summaries (TPU fast path) ----
            # The partition-based path below materializes THREE transposed
            # copies of q/k/v plus full-tensor mask selects; with no padding
            # mask the chunk summaries only need reductions/einsums whose
            # outputs are tiny [b, h, c, d] / [b, h, c, j] tensors, so
            # compute them directly on the [b, h, n, d] layout (XLA fuses
            # the 6-D reshape into the reads — no transposed copy lands in
            # HBM).  Semantics identical to the masked path with an
            # all-False mask (``eva.py:150-196``).
            rf_k_bar, beta = self._chunk_summaries_natural(
                q, k, v, seq_shape, rf_win_size, deterministic)
            if self.seq_axis is not None:
                # ---- sequence-parallel joint softmax (inside shard_map):
                # local windows + gathered chunk summaries ----
                from efficient_attention_tpu.parallel.seq_parallel import (
                    eva_joint_attention_shard,
                )

                w_q = self.window_partition(q, seq_shape, ext_window_size=0)
                w_k = self.window_partition(k, seq_shape, ext_window_size=0)
                w_v = self.window_partition(v, seq_shape, ext_window_size=0)
                out = eva_joint_attention_shard(
                    w_q, w_k, w_v, rf_k_bar, beta, self.scale,
                    self.seq_axis, bias=self._window_bias_general())
                out = self.window_merge(out, seq_shape)
                xo = jnp.swapaxes(out, 1, 2).reshape(
                    (B,) + tuple(seq_shape) + (C,))
                xo = self.proj(xo)
                return self.proj_dropout(xo, deterministic=deterministic)
        else:
            if self.seq_axis is not None:
                raise ValueError(
                    "EVA seq_axis requires no padding mask and no overlap "
                    "halo (windows must not straddle sequence shards)")
            if key_padding_mask is None:
                key_padding_mask = jnp.zeros((B, N), dtype=bool)
            kpm = key_padding_mask.astype(q.dtype)[:, None, :, None]
            rf_w_q = self.window_partition(
                q, seq_shape, window_size=rf_win_size,
                ext_window_size=self.ext_size)
            rf_w_k = self.window_partition(
                k, seq_shape, window_size=rf_win_size,
                ext_window_size=self.ext_size)
            rf_w_v = self.window_partition(
                v, seq_shape, window_size=rf_win_size,
                ext_window_size=self.ext_size)
            # [b, 1, c, j, 1]
            rf_w_mask = self.window_partition(
                kpm, seq_shape, window_size=rf_win_size,
                ext_window_size=self.ext_size, pad_val=1.0,
            ).astype(bool)
            rf_w_q = jnp.where(rf_w_mask, 0.0, rf_w_q)
            rf_w_k = jnp.where(rf_w_mask, 0.0, rf_w_k)
            rf_w_v = jnp.where(rf_w_mask, 0.0, rf_w_v)

            if self.adaptive_proj in ("default", "no-ln"):
                rf_q_bar = self.adaptive_mu_q(jnp.mean(rf_w_q, axis=-2))
                rf_k_bar = self.adaptive_mu_k(jnp.mean(rf_w_k, axis=-2))
                mu = 0.5 * (rf_q_bar + rf_k_bar)  # [b, h, c, d]
            else:  # 'none'
                rf_k_bar = self.adaptive_mu_k(jnp.mean(rf_w_k, axis=-2))
                mu = jnp.zeros_like(rf_k_bar)

            weights = self._sample_weights(mu, deterministic)
            # [b, h, c, j, d] x [b, h, c, 1, d] -> [b, h, c, j]
            log_proj_w_k = prm_projection(
                rf_w_k, weights[..., None, :], normalize=False
            )[..., 0, :]
            log_proj_w_k = jnp.where(
                rf_w_mask[..., 0], MASK_VAL, log_proj_w_k)
            # per-chunk SNIS value summary (``eva.py:192-196``)
            beta = jnp.einsum(
                "...cj,...cjd->...cd",
                jax.nn.softmax(log_proj_w_k, axis=-1), rf_w_v)

        # ---- fused Pallas kernel paths (local + chunk joint softmax in
        # VMEM; see ops/pallas/). Bit-compatible with the XLA path below
        # when no padding / halo is involved. Preference order:
        #   1. row-major kernel (zero layout transposes, 2-D square windows)
        #   2. Swin-layout kernel (windows pre-partitioned)
        #   3. XLA einsum path (always; also supplies gradients) ----
        pallas_ok = (
            self.impl in ("auto", "pallas", "rowmajor")
            and self.ext_size == 0
            and padding_free
            and self.attn_drop == 0.0
            and self.seq_axis is None
            and _on_tpu()
        )
        ws = self.window_size
        _window_bias = self._window_bias_general

        # The zero-transpose row-major kernel measured slightly SLOWER than
        # the Swin-layout kernel end-to-end on v5e (the layout copies it
        # avoids turn out to be cheap; see ops/pallas/eva_rowmajor.py), so it
        # is opt-in via impl='rowmajor'.
        if self.impl == "rowmajor" and pallas_ok and self.attn_2d:
            from efficient_attention_tpu.ops.pallas.eva_rowmajor import (
                eva_attention_rowmajor,
                supports_rowmajor,
            )

            W_img = seq_shape[1]
            if (seq_shape[0] % ws == 0 and W_img % ws == 0
                    and supports_rowmajor(B, N, W_img, ws)):
                output = eva_attention_rowmajor(
                    q, k, v, rf_k_bar, beta, self.scale, W_img, ws,
                    bias=_window_bias())  # [B, H, N, D] token order
                x = jnp.swapaxes(output, 1, 2).reshape(
                    (B,) + tuple(seq_shape) + (C,))
                x = self.proj(x)
                return self.proj_dropout(x, deterministic=deterministic)

        # ---- 1-D kernel path: overlapping halo windows + key-padding
        # masks (the WMT encoder configuration — ops/pallas/eva_1d.py).
        # Eval-only; handles halos and masks the 2-D kernels cannot. ----
        if (not self.attn_2d and ws > 0 and deterministic
                and self.impl in ("auto", "packed")
                and self.attn_drop == 0.0 and _on_tpu()
                and self.seq_axis is None
                and not self.is_initializing()):
            from efficient_attention_tpu.ops.pallas.eva_1d import (
                eva_attention_1d,
                supports_1d,
            )

            if supports_1d(B, N, ws, rf_k_bar.shape[-2]):
                hd = self.num_heads * self.head_dim

                def pack(t):  # [b, h, n, d] -> [b, n, h*d]
                    return jnp.swapaxes(t, 1, 2).reshape(B, N, hd)

                qkv_p = jnp.concatenate([pack(q), pack(k), pack(v)], -1)
                rf_p = jnp.swapaxes(rf_k_bar, 1, 2).reshape(
                    B, rf_k_bar.shape[2], hd)
                bt_p = jnp.swapaxes(beta, 1, 2).reshape(
                    B, beta.shape[2], hd)
                bias1d = None
                if self.use_t5_rpe:
                    bias1d = self.rel_pos_bias(
                        ws, ws + 2 * self.ext_size)[0, :, 0]
                elif self.rpe_enabled:
                    # 1-D learned table is already [H, ws, ws + 2*ext]
                    bias1d = self.local_relative_position_bias_table
                out = eva_attention_1d(
                    qkv_p, rf_p, bt_p,
                    None if padding_free else key_padding_mask,
                    self.scale, self.num_heads, ws, self.ext_size,
                    bias=bias1d, n_orig=N)
                x = self.proj(out)[:, :orig_n]
                return self.proj_dropout(x, deterministic=deterministic)

        w_q = self.window_partition(q, seq_shape, ext_window_size=0)
        w_k = self.window_partition(k, seq_shape, ext_window_size=self.ext_size)
        w_v = self.window_partition(v, seq_shape, ext_window_size=self.ext_size)

        from efficient_attention_tpu.ops.pallas.eva_kernel import supports_shapes

        use_pallas = pallas_ok and supports_shapes(
            B, w_q.shape[2], w_q.shape[3])
        if self.impl == "pallas" and not use_pallas:
            raise ValueError(
                "impl='pallas' requires TPU, no halo, and no padding mask")
        if use_pallas:
            from efficient_attention_tpu.ops.pallas.eva_kernel import (
                eva_attention_fused,
            )

            bias = _window_bias()
            output = eva_attention_fused(
                w_q, w_k, w_v, rf_k_bar, beta, self.scale, bias)
            output = self.window_merge(output, seq_shape)
            x = jnp.swapaxes(output, 1, 2).reshape(
                (B,) + tuple(seq_shape) + (C,))
            x = self.proj(x)
            x = x.reshape(B, N, C)[:, :orig_n]
            if self.attn_2d:
                x = x.reshape((B,) + tuple(seq_shape) + (C,))
            return self.proj_dropout(x, deterministic=deterministic)

        # approx expectation of CVs (``eva.py:200``)
        rfa_chunk = jnp.einsum("...wid,...cd->...wic", w_q, self.scale * rf_k_bar)
        num_rfa_chunks = rfa_chunk.shape[-1]

        # ---- local branch (``eva.py:204-218``) ----
        log_qk_local_dot = (
            jnp.einsum("bhwie,bhwje->bhwij", w_q, w_k,
                       preferred_element_type=jnp.float32) * self.scale
        ).astype(q.dtype)
        if self.use_t5_rpe:
            i, j = log_qk_local_dot.shape[-2:]
            log_qk_local_dot = log_qk_local_dot + self.rel_pos_bias(i, j)
        if self.rpe_enabled:
            log_qk_local_dot = self.add_rel_pos_bias(log_qk_local_dot)
        if not (padding_free and self.ext_size == 0):
            # halo'd windows mask their pad even without a padding mask
            if padding_free:
                key_padding_mask = jnp.zeros((B, N), dtype=bool)
            kpm = key_padding_mask.astype(q.dtype)[:, None, :, None]
            local_dots_mask = jnp.swapaxes(
                self.window_partition(
                    kpm, seq_shape, ext_window_size=self.ext_size,
                    pad_val=1.0,
                ).astype(bool),
                -1, -2,
            )
            log_qk_local_dot = jnp.where(
                local_dots_mask, MASK_VAL, log_qk_local_dot)
        local_len = log_qk_local_dot.shape[-1]

        # ---- fused normalizer over [local | chunks] (``eva.py:222-227``) ----
        attn = jax.nn.softmax(
            jnp.concatenate([log_qk_local_dot, rfa_chunk], axis=-1), axis=-1
        )
        local_attn = attn[..., :local_len]
        ra_attn = attn[..., local_len:]
        output_local = jnp.einsum("bhwij,bhwjd->bhwid", local_attn, w_v)
        output_snis = jnp.einsum("bhwic,bhcd->bhwid", ra_attn, beta)

        output = self.window_merge(output_snis + output_local, seq_shape)
        x = jnp.swapaxes(output, 1, 2).reshape((B,) + tuple(seq_shape) + (C,))
        x = self.proj(x)
        x = x.reshape(B, N, C)[:, :orig_n]
        if self.attn_2d:
            x = x.reshape((B,) + tuple(seq_shape) + (C,))
        return self.proj_dropout(x, deterministic=deterministic)

    @staticmethod
    def add_attn_specific_args(parent_parser, struct_name="attn_args", prefix=""):
        from efficient_attention_tpu.config import add_nested_argument

        parent_parser = LocalAttention.add_attn_specific_args(
            parent_parser, struct_name=struct_name, prefix=prefix
        )
        parser = parent_parser.add_argument_group("attention")
        p = prefix + "-" if len(prefix) > 1 else ""
        add_nested_argument(parser, f"--{p}adaptive-proj", struct_name=struct_name,
                            prefix=prefix, default="default", type=str)
        add_nested_argument(parser, f"--{p}num-landmarks", struct_name=struct_name,
                            prefix=prefix, default=49, type=int)
        add_nested_argument(parser, f"--{p}use-t5-rpe", action="store_true",
                            struct_name=struct_name, prefix=prefix, default=False)
        return parent_parser
