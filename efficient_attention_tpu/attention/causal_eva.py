"""Causal EVA: decoder-side EVA with O(window + chunks) incremental decoding.

TPU-native rebuild of ``efficient-attention/efficient_attention/causal_eva.py``.

Two paths:
  * **parallel** (training / full-sequence scoring, ``causal_eva.py:666-788``):
    blocked local attention with a backward-only halo and a per-chunk RF
    branch whose chunk summaries are visible only to strictly-later chunks.
  * **incremental** (autoregressive decode): a fixed-shape state pytree
    (ring-free slot buffers + counters derived from the position) updated by
    ``decode_step``, usable directly under ``lax.scan`` / beam search.

Design deviations from the reference (both are fidelity *fixes*, kept because
they make full-vs-incremental agreement exact in f32 — the property the
reference's own self-test (``causal_eva.py:916-950``) probes.  In bf16 the
two paths agree to rounding only (they always did — different op orders);
the fused parallel kernel (``impl='auto'`` on TPU) round-trips its logits
through the compute dtype so its quantization matches the XLA path's):
  1. The reference decode keeps a *sliding* window while its parallel path is
     *blocked* local attention ("might switch to block-wise", reference
     ``causal_eva.py:629``).  We decode block-wise, so both paths match
     exactly.
  2. The reference decode computes T5-RPE buckets from ``rel = j`` instead of
     the parallel path's ``rel = j - i`` (``causal_eva.py:88-97`` applied with
     i=1).  We index the same static bucket table as the parallel path.

Dynamic "chunk fills up" logic (reference ``causal_eva.py:583-612``) becomes
fixed-shape ``dynamic_update_slice`` writes + ``jnp.where`` commits keyed on
counters derived from the absolute position.

A quantified decode-delta comparison against the reference's decode rule is
impossible: the reference's incremental entry point cannot execute at all —
``forward`` with ``incremental_state`` hits an UnboundLocalError (``N`` is
only assigned in the ``incremental_state is None`` branch,
``causal_eva.py:504-509``; verified by running it).  The runnable ground
truth is therefore its parallel path, which this module matches exactly
(golden fixture ``tests/goldens/causal_eva_parallel.npz``) and which our
incremental decode reproduces bit-exactly (``tests/test_causal_eva.py``).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efficient_attention_tpu.attention.base import MASK_VAL
from efficient_attention_tpu.ops import windows as W
from efficient_attention_tpu.ops.random_features import prm_projection
from efficient_attention_tpu.ops.rpe import t5_bucket_table

Array = jax.Array

xavier_half = nn.initializers.variance_scaling(0.5, "fan_avg", "uniform")
xavier = nn.initializers.xavier_uniform()


class EvaDecodeState(NamedTuple):
    """Fixed-shape incremental state (replaces the reference's dict of
    ragged tensors, ``causal_eva.py:557-636``)."""

    pos: Array  # scalar int32: number of tokens already processed
    prev_window_k: Array  # [b, h, w, d] previous block (for overlap halo)
    prev_window_v: Array  # [b, h, w, d]
    cur_window_k: Array  # [b, h, w, d] current block, slots [0, pos % w)
    cur_window_v: Array  # [b, h, w, d]
    chunk_q: Array  # [b, h, cs, d] current chunk accumulator
    chunk_k: Array  # [b, h, cs, d]
    chunk_v: Array  # [b, h, cs, d]
    rf_k_bar: Array  # [b, h, max_chunks, d] completed-chunk summaries
    beta: Array  # [b, h, max_chunks, d]


def reorder_decode_state(state: EvaDecodeState, order: Array) -> EvaDecodeState:
    """Beam-search reordering (``causal_eva.py:835-849``)."""
    return EvaDecodeState(
        state.pos, *(x[order] for x in state[1:])
    )


class CausalEVAttention(nn.Module):
    """Causal EVA attention (``causal_eva.py:297-914``).

    Batch-first convention: ``query/key/value: [B, T, C]`` (the reference is
    fairseq time-first ``[T, B, C]``; the transformer stack here is
    batch-first throughout).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    bias: bool = True
    window_size: int = 4
    overlap_window: bool = False
    causal: bool = True
    num_chunks: Optional[int] = None
    chunk_size: Optional[int] = None
    adaptive_proj: str = "qk"
    use_t5_rpe: bool = False
    # 'auto': fused Pallas parallel path on TPU when the geometry allows
    # (ops/pallas/causal_packed.py); 'packed': force it (interpret mode off
    # TPU — used by tests); 'xla': never
    impl: str = "auto"
    # sequence/context parallelism: when set (a mesh axis name) the module
    # must run INSIDE shard_map with tokens sharded along that axis; local
    # windows stay on-shard and only the tiny [c, d] chunk summaries are
    # all-gathered (parallel/seq_parallel.py — the TPU-idiomatic replacement
    # for ring attention, SURVEY §5 long-context)
    seq_axis: Optional[str] = None
    # iPQ quantization noise on the q/k/v/out projections (the reference
    # carries its own quant_noise copy, ``causal_eva.py:118-215``, and
    # applies it at ``causal_eva.py:339-430``)
    q_noise: float = 0.0
    qn_block_size: int = 8

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def scaling(self) -> float:
        return self.head_dim ** -0.5

    @property
    def ext_size(self) -> int:
        # full-window backward halo when overlapping (``causal_eva.py:353-356``)
        return max(1, self.window_size) if self.overlap_window else 0

    def setup(self):
        assert self.embed_dim % self.num_heads == 0
        if self.chunk_size is None and self.num_chunks is None:
            # the reference crashes deep in forward on this combination
            # (``causal_eva.py:679`` int(N // None)); fail at build time
            raise ValueError(
                "CausalEVAttention needs chunk_size or num_chunks "
                "(e.g. --attn-chunk-size 8)")
        if self.chunk_size is not None:
            assert (
                self.window_size >= self.chunk_size
                and self.window_size % self.chunk_size == 0
            ), "window_size must be a positive multiple of chunk_size"
        from efficient_attention_tpu.models.quant_noise import dense

        self.dropout_module = nn.Dropout(self.dropout)
        qn = (self.q_noise, self.qn_block_size)
        self.q_proj = dense(self.embed_dim, *qn, use_bias=self.bias,
                            kernel_init=xavier_half, name="q_proj")
        self.k_proj = dense(self.embed_dim, *qn, use_bias=self.bias,
                            kernel_init=xavier_half, name="k_proj")
        self.v_proj = dense(self.embed_dim, *qn, use_bias=self.bias,
                            kernel_init=xavier_half, name="v_proj")
        self.out_proj = dense(self.embed_dim, *qn, use_bias=self.bias,
                              kernel_init=xavier,
                              bias_init=nn.initializers.zeros,
                              name="out_proj")
        if self.adaptive_proj == "qk":
            self.adaptive_mu_q = nn.Sequential(
                [nn.Dense(self.head_dim, kernel_init=xavier_half), nn.LayerNorm()],
                name="adaptive_mu_q")
            self.adaptive_mu_k = nn.Sequential(
                [nn.Dense(self.head_dim, kernel_init=xavier_half), nn.LayerNorm()],
                name="adaptive_mu_k")
        elif self.adaptive_proj == "no-ln":
            self.adaptive_mu_q = nn.Sequential(
                [nn.Dense(self.head_dim, kernel_init=xavier_half)],
                name="adaptive_mu_q")
            self.adaptive_mu_k = nn.Sequential(
                [nn.Dense(self.head_dim, kernel_init=xavier_half)],
                name="adaptive_mu_k")
        else:
            raise NotImplementedError(f"adaptive_proj={self.adaptive_proj}")
        if self.use_t5_rpe and self.window_size > 0:
            # scalar (head-shared) bias variant (``causal_eva.py:47-97``)
            self.rel_pos_bias_table = self.param(
                "rel_pos_bias",
                nn.initializers.normal(stddev=1.0),
                (max(min((self.window_size + self.ext_size) // 2, 64), 16), 1),
            )

    # ------------------------------------------------------------------ rpe --
    def _t5_bias(self, i: int, j: int) -> Optional[Array]:
        """Static ``[i, j]`` bias table (matches reference rel = k_pos - q_pos
        with no halo offset, ``causal_eva.py:88-97``)."""
        if not (self.use_t5_rpe and self.window_size > 0):
            return None
        num_buckets = self.rel_pos_bias_table.shape[0]
        buckets = t5_bucket_table(
            i, j, causal=self.causal, num_buckets=num_buckets,
            max_distance=self.window_size + self.ext_size, k_offset=0,
        )
        bias = jnp.take(self.rel_pos_bias_table[:, 0],
                        jnp.asarray(buckets.reshape(-1)), axis=0)
        return bias.reshape(i, j) * self.scaling

    # ------------------------------------------------------- packed kernel --
    def _packed_ok(self, B, N, tgt_len, had_mask, deterministic,
                   rf_chunk_size, itemsize) -> bool:
        from efficient_attention_tpu.attention.base import on_tpu
        from efficient_attention_tpu.ops.pallas.causal_packed import (
            supports_causal_packed,
        )

        if self.impl == "xla":
            return False
        if self.impl == "auto" and not on_tpu():
            return False
        return (self.causal and self.ext_size == 0 and self.window_size > 0
                and self.window_size % rf_chunk_size == 0
                and N == tgt_len and not had_mask
                and (deterministic or self.dropout == 0.0)
                and self.head_dim % 64 == 0
                and supports_causal_packed(B, N, self.window_size,
                                           rf_chunk_size,
                                           hd=self.embed_dim,
                                           itemsize=itemsize))

    def _forward_packed(self, qp, kp, vp, rf_k_bar, beta, rf_chunk_size,
                        tgt_len, deterministic=True, packed_layout=False):
        """Fused Pallas parallel path (``ops/pallas/causal_packed.py``):
        consumes the packed ``[B, N, H*D]`` projections and the chunk
        summaries (head-major ``[b, h, c, d]``, or already-packed
        ``[B, C, H*D]`` when ``packed_layout``); the XLA path's
        ``[b, h, g, i, c]`` control-variate logits and joint softmax never
        materialize in HBM."""
        import numpy as _np

        from efficient_attention_tpu.attention.base import on_tpu
        from efficient_attention_tpu.ops.pallas.causal_packed import (
            causal_eva_packed,
        )

        B = qp.shape[0]
        hd = self.num_heads * self.head_dim
        w = self.window_size
        tri = _np.triu(_np.ones((w, w), _np.float32), 1)
        tab = jnp.asarray(_np.where(tri, MASK_VAL, 0.0).astype(_np.float32))
        bias = self._t5_bias(w, w)
        if bias is not None:
            tab = tab + bias.astype(jnp.float32)
        if packed_layout:
            rf_pk, beta_pk = rf_k_bar, beta
        else:
            rf_pk = jnp.swapaxes(rf_k_bar, 1, 2).reshape(B, -1, hd)
            beta_pk = jnp.swapaxes(beta, 1, 2).reshape(B, -1, hd)
        from efficient_attention_tpu.models.quant_noise import qn_call

        out = causal_eva_packed(
            qp, kp, vp, rf_pk, beta_pk, self.scaling, self.num_heads,
            w, rf_chunk_size, bias_tab=tab, interpret=not on_tpu())
        return qn_call(self.out_proj, out, deterministic)[:, :tgt_len]

    def _summaries_packed(self, qp, kp, vp, cs, deterministic):
        """Chunk summaries computed IN the packed ``[B, N, H*D]`` layout.

        Same math as the head-major stage below (reference
        ``causal_eva.py:706-736``: mu = mu_q(mean q) + mu_k(mean k), logp =
        <mu, k>/sqrt(d) - |k|^2/(2 sqrt(d)), beta = softmax_j(logp) @ v) but
        every reshape is a contiguous split — no ``[B, H, T, d]`` head
        transposes and no ``[b, h, c, j, d]`` window scatter.  Measured at
        the T=512 recipe shape the head-major stage cost ~1 ms/layer
        fwd+bwd, almost all layout traffic.  The proposal noise is drawn in
        the head-major shape and transposed (tiny tensor) so the drawn bits
        are identical to the XLA path's; the surrounding summary numerics
        (mul-sum vs einsum, layout-transposed Dense/LayerNorm) agree to
        rounding, which is why the parity tests use atol ~3e-5 rather than
        exact equality."""
        B, N, hd = qp.shape
        H, d = self.num_heads, self.head_dim
        C = N // cs
        q5 = qp.reshape(B, C, cs, H, d)
        k5 = kp.reshape(B, C, cs, H, d)
        v5 = vp.reshape(B, C, cs, H, d)
        rf_q_bar = self.adaptive_mu_q(jnp.mean(q5, axis=2))  # [B, C, H, d]
        rf_k_bar = self.adaptive_mu_k(jnp.mean(k5, axis=2))
        mu = rf_q_bar + rf_k_bar
        if not deterministic:
            rng = self.make_rng("sample")
            noise = jax.random.normal(rng, (B, H, C, d), mu.dtype)
            mu = mu + jnp.transpose(noise, (0, 2, 1, 3))
        dn = d ** -0.5
        dash = jnp.sum(mu[:, :, None] * (dn * k5), axis=-1)  # [B, C, cs, H]
        norm = dn * jnp.sum(jnp.square(k5), axis=-1) / 2.0
        p = jax.nn.softmax(dash - norm, axis=2)
        beta = jnp.sum(p[..., None] * v5, axis=2)            # [B, C, H, d]
        return rf_k_bar.reshape(B, C, hd), beta.reshape(B, C, hd)

    # ------------------------------------------------------------- parallel --
    def __call__(
        self,
        query: Array,
        key: Optional[Array] = None,
        value: Optional[Array] = None,
        key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        """Full-sequence (parallel) path (``causal_eva.py:666-788``)."""
        B, tgt_len, C = query.shape
        assert C == self.embed_dim
        had_mask = key_padding_mask is not None
        if key is None:
            key = query
        if value is None:
            value = query

        if self.window_size > 0:
            query = W.pad_to_multiple(query, self.window_size, axis=-2)
            key = W.pad_to_multiple(key, self.window_size, axis=-2)
            value = W.pad_to_multiple(value, self.window_size, axis=-2)
            N = query.shape[-2]
            if key_padding_mask is None:
                if N != tgt_len:
                    key_padding_mask = W.padding_mask_for(B, tgt_len, N)
            else:
                key_padding_mask = W.pad_to_multiple(
                    key_padding_mask, self.window_size, axis=-1, value=True)
        N = query.shape[-2]

        def split(t: Array) -> Array:
            return jnp.swapaxes(
                t.reshape(B, -1, self.num_heads, self.head_dim), 1, 2)

        from efficient_attention_tpu.models.quant_noise import qn_call

        # packed [B, N, H*D] (kernel layout)
        qp = qn_call(self.q_proj, query, deterministic)
        kp = qn_call(self.k_proj, key, deterministic)
        vp = qn_call(self.v_proj, value, deterministic)

        if self.chunk_size is not None:
            rf_chunk_size = self.chunk_size
        else:
            rf_chunk_size = int(N // self.num_chunks)
        rf_chunk_size = min(rf_chunk_size, N)

        if (self.seq_axis is None
                and self._packed_ok(B, N, tgt_len, had_mask, deterministic,
                                    rf_chunk_size, qp.dtype.itemsize)):
            # summaries + joint attention both in the packed layout: no
            # head transposes anywhere on this path
            rf_pk, beta_pk = self._summaries_packed(
                qp, kp, vp, rf_chunk_size, deterministic)
            return self._forward_packed(
                qp, kp, vp, rf_pk, beta_pk, rf_chunk_size, tgt_len,
                deterministic=deterministic, packed_layout=True)

        q, k, v = split(qp), split(kp), split(vp)

        if key_padding_mask is None:
            key_padding_mask = jnp.zeros((B, N), dtype=bool)
        kpm = key_padding_mask.astype(q.dtype)[:, None, :, None]  # [b, 1, n, 1]

        w_q = W.causal_window_1d_partition(q, self.window_size, 0)
        w_k = W.causal_window_1d_partition(k, self.window_size, self.ext_size)
        w_v = W.causal_window_1d_partition(v, self.window_size, self.ext_size)

        rf_w_q = W.causal_window_1d_partition(q, rf_chunk_size, 0)
        rf_w_k = W.causal_window_1d_partition(k, rf_chunk_size, 0)
        rf_w_v = W.causal_window_1d_partition(v, rf_chunk_size, 0)
        rf_w_mask = W.causal_window_1d_partition(
            kpm, rf_chunk_size, 0, pad_val=1.0).astype(bool)  # [b, 1, c, j, 1]
        rf_w_q = jnp.where(rf_w_mask, 0.0, rf_w_q)
        rf_w_k = jnp.where(rf_w_mask, 0.0, rf_w_k)
        rf_w_v = jnp.where(rf_w_mask, 0.0, rf_w_v)

        rf_q_bar = self.adaptive_mu_q(jnp.mean(rf_w_q, axis=-2))
        rf_k_bar = self.adaptive_mu_k(jnp.mean(rf_w_k, axis=-2))
        mu = rf_q_bar + rf_k_bar  # [b, h, c, d] (``causal_eva.py:717``)

        if not deterministic:
            sample_rng = self.make_rng("sample")
            if self.seq_axis is not None:
                # distinct proposal noise per sequence shard (the global
                # chunks are iid; an unfolded key would repeat the same
                # noise on every shard)
                sample_rng = jax.random.fold_in(
                    sample_rng, jax.lax.axis_index(self.seq_axis))
            mu = mu + jax.random.normal(sample_rng, mu.shape, mu.dtype)
        # [b, h, c, j]
        log_proj_w_k = prm_projection(rf_w_k, mu[..., None, :], normalize=False)[..., 0, :]
        log_proj_w_k = jnp.where(rf_w_mask[..., 0], MASK_VAL, log_proj_w_k)
        beta = jnp.einsum(
            "...cj,...cjd->...cd",
            jax.nn.softmax(log_proj_w_k, axis=-1), rf_w_v)

        if self.seq_axis is not None:
            # ---- sequence-parallel path (inside shard_map): this shard's
            # windows + summaries feed the gathered joint softmax; chunk
            # causality uses GLOBAL positions via axis_index ----
            from efficient_attention_tpu.parallel.seq_parallel import (
                causal_eva_attention_shard,
            )

            if (had_mask or self.ext_size != 0 or not self.causal
                    or N != tgt_len or N % self.window_size != 0
                    or self.chunk_size is None):
                raise ValueError(
                    "seq_axis requires causal mode, no overlap halo, no "
                    "padding mask, a fixed chunk_size (num_chunks would "
                    "derive from the LOCAL shard length), and shard length "
                    "a multiple of window_size")
            bias = self._t5_bias(self.window_size, self.window_size)
            drop_rng = None
            if not deterministic and self.dropout > 0.0:
                # per-shard attention-dropout mask (reference applies
                # dropout to the joint probs, ``causal_eva.py:778``)
                drop_rng = jax.random.fold_in(
                    self.make_rng("dropout"),
                    jax.lax.axis_index(self.seq_axis))
            out = causal_eva_attention_shard(
                w_q, w_k, w_v, rf_k_bar, beta, self.scaling,
                self.seq_axis, rf_chunk_size, bias=bias,
                dropout_rate=self.dropout, dropout_rng=drop_rng)
            x = jnp.swapaxes(W.window_1d_merge(out), 1, 2).reshape(B, N, C)
            return qn_call(self.out_proj, x, deterministic)

        if self.impl == "packed":
            raise ValueError(
                "impl='packed' requires causal mode, no overlap halo, "
                "window a multiple of chunk_size dividing the sequence, no "
                "padding mask, head_dim a multiple of 64, and zero "
                "attention dropout when training")

        # [b, h, g, i, c]
        approx_cv = jnp.einsum("...wid,...cd->...wic", w_q, self.scaling * rf_k_bar)
        num_chunks_total = approx_cv.shape[-1]
        if self.causal:
            # query at global position p sees chunk c iff c < p // rf_chunk_size
            # (static port of the triu(0) mask dance, ``causal_eva.py:731-739``)
            pos = np.arange(N)[:, None]
            chunk_ids = np.arange(num_chunks_total)[None, :]
            chunk_mask = jnp.asarray(chunk_ids >= (pos // rf_chunk_size))  # [n, c]
            chunk_mask = W.causal_window_1d_partition(
                chunk_mask[None, None].astype(q.dtype), self.window_size, 0,
            ).astype(bool)  # [1, 1, g, i, c]
            approx_cv = jnp.where(chunk_mask, MASK_VAL, approx_cv)

        mask_q = W.causal_window_1d_partition(
            kpm, self.window_size, 0, pad_val=1.0).astype(bool)  # [b, 1, g, i, 1]
        mask_k = jnp.swapaxes(
            W.causal_window_1d_partition(
                kpm, self.window_size, self.ext_size, pad_val=1.0).astype(bool),
            -1, -2)  # [b, 1, g, 1, j]
        local_dots_mask = jnp.logical_or(mask_q, mask_k)

        log_qk = (
            jnp.einsum("bhwie,bhwje->bhwij", w_q, w_k,
                       preferred_element_type=jnp.float32) * self.scaling
        ).astype(q.dtype)
        bias = self._t5_bias(log_qk.shape[-2], log_qk.shape[-1])
        if bias is not None:
            log_qk = log_qk + bias[None, None, None]
        log_qk = jnp.where(local_dots_mask, MASK_VAL, log_qk)
        if self.causal:
            i, j = log_qk.shape[-2], log_qk.shape[-1]
            tri = jnp.asarray(
                np.triu(np.ones((i, j), dtype=bool), 1 + self.ext_size))
            log_qk = jnp.where(tri[None, None, None], MASK_VAL, log_qk)
        local_len = log_qk.shape[-1]

        attn = jax.nn.softmax(
            jnp.concatenate([log_qk, approx_cv], axis=-1), axis=-1)
        attn = self.dropout_module(attn, deterministic=deterministic)
        local_attn = attn[..., :local_len]
        ra_attn = attn[..., local_len:]
        output_local = jnp.einsum("bhwij,bhwjd->bhwid", local_attn, w_v)
        output_snis = jnp.einsum("bhwic,bhcd->bhwid", ra_attn, beta)

        output = W.window_1d_merge(output_snis + output_local)  # [b, h, n, d]
        x = jnp.swapaxes(output, 1, 2).reshape(B, N, C)
        x = qn_call(self.out_proj, x, deterministic)
        return x[:, :tgt_len]

    # ---------------------------------------------------------- incremental --
    def init_decode_state(
        self, batch_size: int, max_len: int, dtype=jnp.float32
    ) -> EvaDecodeState:
        """Allocate fixed-shape decode buffers for up to ``max_len`` tokens."""
        assert self.chunk_size is not None, "decoding requires a fixed chunk_size"
        b, h, d, w, cs = (batch_size, self.num_heads, self.head_dim,
                          self.window_size, self.chunk_size)
        max_chunks = max(1, max_len // cs)
        zeros = lambda *shape: jnp.zeros(shape, dtype)  # noqa: E731
        return EvaDecodeState(
            pos=jnp.zeros((), jnp.int32),
            prev_window_k=zeros(b, h, w, d),
            prev_window_v=zeros(b, h, w, d),
            cur_window_k=zeros(b, h, w, d),
            cur_window_v=zeros(b, h, w, d),
            chunk_q=zeros(b, h, cs, d),
            chunk_k=zeros(b, h, cs, d),
            chunk_v=zeros(b, h, cs, d),
            rf_k_bar=zeros(b, h, max_chunks, d),
            beta=zeros(b, h, max_chunks, d),
        )

    def decode_step(
        self,
        state: EvaDecodeState,
        query: Array,
        key: Optional[Array] = None,
        value: Optional[Array] = None,
    ) -> Tuple[Array, EvaDecodeState]:
        """Process ONE token; returns ``(output [B, 1, C], new_state)``.

        Fixed-shape re-derivation of the reference incremental branch
        (``causal_eva.py:537-665``) in block-consistent form.
        """
        B, one, C = query.shape
        assert one == 1
        if key is None:
            key = query
        if value is None:
            value = query
        w, cs = self.window_size, self.chunk_size
        t = state.pos

        def split(x: Array) -> Array:
            return jnp.swapaxes(
                x.reshape(B, 1, self.num_heads, self.head_dim), 1, 2)

        q = split(self.q_proj(query))  # [b, h, 1, d]
        k = split(self.k_proj(key))
        v = split(self.v_proj(value))

        i = t % w  # slot within the current window block
        c_fill = t % cs  # slot within the current chunk
        n_complete = t // cs  # completed chunks so far

        # -- window buffers: on block boundary, current block becomes previous
        at_boundary = (i == 0)
        prev_k = jnp.where(at_boundary, state.cur_window_k, state.prev_window_k)
        prev_v = jnp.where(at_boundary, state.cur_window_v, state.prev_window_v)
        cur_k = jax.lax.dynamic_update_slice_in_dim(
            state.cur_window_k, k, i, axis=2)
        cur_v = jax.lax.dynamic_update_slice_in_dim(
            state.cur_window_v, v, i, axis=2)

        # -- chunk accumulators
        chunk_q = jax.lax.dynamic_update_slice_in_dim(state.chunk_q, q, c_fill, axis=2)
        chunk_k = jax.lax.dynamic_update_slice_in_dim(state.chunk_k, k, c_fill, axis=2)
        chunk_v = jax.lax.dynamic_update_slice_in_dim(state.chunk_v, v, c_fill, axis=2)

        # -- chunk dump (computed every step, committed when the chunk fills;
        #    reference ``causal_eva.py:583-612``)
        cur_rf_q_bar = self.adaptive_mu_q(jnp.mean(chunk_q, axis=-2, keepdims=True))
        cur_rf_k_bar = self.adaptive_mu_k(jnp.mean(chunk_k, axis=-2, keepdims=True))
        mu = cur_rf_q_bar + cur_rf_k_bar  # [b, h, 1, d]
        log_proj_k = prm_projection(chunk_k, mu, normalize=False)  # [b, h, 1, cs]
        cur_beta = jnp.einsum(
            "...nj,...jd->...nd", jax.nn.softmax(log_proj_k, axis=-1), chunk_v)
        chunk_complete = (c_fill == cs - 1)
        rf_k_bar_new = jax.lax.dynamic_update_slice_in_dim(
            state.rf_k_bar, cur_rf_k_bar, n_complete, axis=2)
        beta_new = jax.lax.dynamic_update_slice_in_dim(
            state.beta, cur_beta, n_complete, axis=2)
        rf_k_bar = jnp.where(chunk_complete, rf_k_bar_new, state.rf_k_bar)
        beta = jnp.where(chunk_complete, beta_new, state.beta)
        # chunks visible to THIS query: strictly earlier completed chunks,
        # i.e. t // cs (the current chunk is excluded even once complete,
        # matching the parallel triu(0) semantics).

        # -- assemble local keys: [prev block (halo) | current block]
        if self.ext_size > 0:
            keys = jnp.concatenate([prev_k, cur_k], axis=2)  # [b, h, 2w, d]
            vals = jnp.concatenate([prev_v, cur_v], axis=2)
            slot_pos = jnp.concatenate(
                [jnp.arange(-w, 0), jnp.arange(0, w)])  # position rel. block start
        else:
            keys, vals = cur_k, cur_v
            slot_pos = jnp.arange(0, w)
        block_start = t - i
        global_pos = block_start + slot_pos  # [J]
        valid = (global_pos >= 0) & (global_pos <= t)  # causal + existence

        local_logits = (
            jnp.einsum("bhod,bhjd->bhoj", q, keys,
                       preferred_element_type=jnp.float32) * self.scaling
        ).astype(q.dtype)  # [b, h, 1, J]
        bias = self._t5_bias(w, w + self.ext_size)
        if bias is not None:
            # same static table as the parallel path, row = query's block slot
            local_logits = local_logits + jnp.take(bias, i, axis=0)[None, None, None]
        local_logits = jnp.where(valid[None, None, None], local_logits, MASK_VAL)

        chunk_logits = jnp.einsum(
            "bhod,bhcd->bhoc", q, self.scaling * rf_k_bar)  # [b, h, 1, Cmax]
        max_chunks = chunk_logits.shape[-1]
        chunk_valid = jnp.arange(max_chunks) < (t // cs)
        chunk_logits = jnp.where(
            chunk_valid[None, None, None], chunk_logits, MASK_VAL)

        attn = jax.nn.softmax(
            jnp.concatenate([local_logits, chunk_logits], axis=-1), axis=-1)
        local_attn = attn[..., : local_logits.shape[-1]]
        ra_attn = attn[..., local_logits.shape[-1]:]
        out = jnp.einsum("bhoj,bhjd->bhod", local_attn, vals) + jnp.einsum(
            "bhoc,bhcd->bhod", ra_attn, beta)

        x = jnp.swapaxes(out, 1, 2).reshape(B, 1, C)
        x = self.out_proj(x)

        # reset chunk accumulators once dumped (stale slots are overwritten
        # before reuse, so zeroing is only needed for the mean computation)
        chunk_q = jnp.where(chunk_complete, jnp.zeros_like(chunk_q), chunk_q)
        chunk_k = jnp.where(chunk_complete, jnp.zeros_like(chunk_k), chunk_k)
        chunk_v = jnp.where(chunk_complete, jnp.zeros_like(chunk_v), chunk_v)

        new_state = EvaDecodeState(
            pos=t + 1,
            prev_window_k=prev_k, prev_window_v=prev_v,
            cur_window_k=cur_k, cur_window_v=cur_v,
            chunk_q=chunk_q, chunk_k=chunk_k, chunk_v=chunk_v,
            rf_k_bar=rf_k_bar, beta=beta,
        )
        return x, new_state

    @staticmethod
    def add_attn_specific_args(parent_parser, struct_name="attn_args", prefix=""):
        from efficient_attention_tpu.config import add_nested_argument

        parser = parent_parser.add_argument_group("attention")
        p = prefix + "-" if len(prefix) > 1 else ""
        add_nested_argument(parser, f"--{p}adaptive-proj", struct_name=struct_name,
                            prefix=prefix, default="qk", type=str)
        add_nested_argument(parser, f"--{p}num-chunks", struct_name=struct_name,
                            prefix=prefix, default=None, type=int)
        add_nested_argument(parser, f"--{p}chunk-size", struct_name=struct_name,
                            prefix=prefix, default=None, type=int)
        add_nested_argument(parser, f"--{p}causal", action="store_true",
                            struct_name=struct_name, prefix=prefix, default=False)
        add_nested_argument(parser, f"--{p}use-t5-rpe", action="store_true",
                            struct_name=struct_name, prefix=prefix, default=False)
        add_nested_argument(parser, f"--{p}window-size", struct_name=struct_name,
                            prefix=prefix, default=4, type=int)
        add_nested_argument(parser, f"--{p}overlap-window", action="store_true",
                            struct_name=struct_name, prefix=prefix, default=False)
        add_nested_argument(parser, f"--{p}impl", struct_name=struct_name,
                            prefix=prefix, default="auto", type=str,
                            choices=["auto", "xla", "packed"])
        return parent_parser
