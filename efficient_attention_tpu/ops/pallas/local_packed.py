"""Packed zero-transpose blocked LOCAL attention (SURVEY §7.5a).

The chunk-less sibling of ``eva_packed.py``: windowed exact attention with
RPE over 2-D square windows, consuming the fused qkv projection output
``[B, N, 3*H*D]`` directly and writing ``[B, N, H*D]`` — no head transpose
or window-partition copy anywhere.  Strip/visibility/bias machinery is
shared with the EVA kernel.

Reference hot path: ``local_attention.py:134-182``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficient_attention_tpu.ops.pallas.eva_packed import (
    _bias_to_token_coords,
    _pick_rows,
    _strip_maps,
    supports_packed,  # noqa: F401 — shared gate (c=0: no chunk columns)
)


def _kernel(qkv_ref, bias_ref, o_ref, *, scale: float, nh: int, d: int):
    for h in range(nh):
        qh = qkv_ref[:, 0, :, h * d:(h + 1) * d]
        kh = qkv_ref[:, 0, :, (nh + h) * d:(nh + h + 1) * d]
        vh = qkv_ref[:, 0, :, (2 * nh + h) * d:(2 * nh + h + 1) * d]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + bias_ref[h][None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, 0, :, h * d:(h + 1) * d] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "nh", "W", "ws", "interpret"))
def _fwd(qkv, bias_big, scale, nh, W, ws, interpret=False):
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    RB, TGS = _pick_rows(B, N, W, ws)
    ns = N // TGS
    qkv4 = qkv.reshape(B, ns, TGS, three_hd)
    grid = (B // RB, ns)
    qkv_spec = pl.BlockSpec((RB, 1, TGS, three_hd),
                            lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, TGS, TGS), lambda b, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RB, 1, TGS, nh * d), lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, scale=scale, nh=nh, d=d)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[qkv_spec, bias_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, ns, TGS, nh * d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv4, bias_big)
    return out.reshape(B, N, nh * d)


def _xla_rowmajor(qkv, scale, nh, W, ws, bias):
    """Strip-form XLA reference (test oracle and VJP source — free reshapes
    only, mirroring the kernel's layout)."""
    B, N, three_hd = qkv.shape
    d = three_hd // (3 * nh)
    TGS = W * ws
    ns = N // TGS
    qkv6 = qkv.reshape(B, ns, TGS, 3, nh, d)
    q, k, v = qkv6[:, :, :, 0], qkv6[:, :, :, 1], qkv6[:, :, :, 2]
    Rj, mask_add = _strip_maps(W, ws, TGS)
    logits = jnp.einsum("bsihd,bsjhd->bshij", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + _bias_to_token_coords(bias, Rj)[None, None]
    logits = logits + mask_add[None, None, None]
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bshij,bsjhd->bsihd", attn, v)
    return out.reshape(B, N, nh * d)


@functools.lru_cache(maxsize=None)
def _make_differentiable(scale, nh, W, ws, has_bias, interpret):
    @jax.custom_vjp
    def f(qkv, bias_big, bias):
        return _fwd(qkv, bias_big, scale, nh, W, ws, interpret=interpret)

    def fwd(qkv, bias_big, bias):
        return f(qkv, bias_big, bias), (qkv, bias)

    def bwd(res, g):
        qkv, bias = res
        ref = lambda qkv, bias: _xla_rowmajor(  # noqa: E731
            qkv, scale, nh, W, ws, bias if has_bias else None)
        _, vjp = jax.vjp(ref, qkv, bias)
        dqkv, dbias = vjp(g)
        tgs = _pick_rows(qkv.shape[0], qkv.shape[1], W, ws)[1]
        if not has_bias:
            dbias = jnp.zeros_like(bias)
        return dqkv, jnp.zeros((nh, tgs, tgs), jnp.float32), dbias

    f.defvjp(fwd, bwd)
    return f


def local_attention_packed(
    qkv: jax.Array,  # [B, N, 3*H*D]
    scale: float,
    num_heads: int,
    W: int,
    ws: int,
    bias: Optional[jax.Array] = None,  # [H, S, S] Swin-local RPE bias
    interpret: bool = False,
) -> jax.Array:
    """Zero-transpose blocked local attention; returns ``[B, N, H*D]``."""
    B, N, _ = qkv.shape
    nh = num_heads
    TGS = _pick_rows(B, N, W, ws)[1]
    Rj, mask_add = _strip_maps(W, ws, TGS)
    if bias is None:
        bias_big = jnp.broadcast_to(mask_add, (nh, TGS, TGS))
        bias_in = jnp.zeros((nh, ws * ws, ws * ws), jnp.float32)
    else:
        bias_big = _bias_to_token_coords(bias, Rj) + mask_add
        bias_in = bias
    f = _make_differentiable(float(scale), nh, W, ws, bias is not None,
                             interpret)
    return f(qkv, bias_big, bias_in)
