"""Decompose the dense TG=8 EVA kernel's cost: IO vs MXU vs VPU.

Variants of the round-1 kernel at the bench geometry, each removing one
stage, to find where the 2.9ms/call actually goes.
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, G, S, C, D = 128, 3, 16, 49, 49, 64
TG, RB = 8, 4
TGS = TG * S
ITERS = 20
MASK_VAL = -5e4


def _kern(q_ref, k_ref, v_ref, rf_ref, beta_ref, bias_ref, o_ref,
          *, scale, mode):
    qq = q_ref[:, 0]
    if mode == "io":
        o_ref[:, 0] = qq
        return
    kk = k_ref[:, 0]
    vv = v_ref[:, 0]
    rr = rf_ref[:, 0]
    bt = beta_ref[:, 0]
    keys = jnp.concatenate([kk, rr], axis=1)
    vals = jnp.concatenate([vv, bt], axis=1)
    logits = jax.lax.dot_general(
        qq, keys, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    logits = logits + bias_ref[0][None]
    if mode == "mm_only":
        p = logits
    elif mode == "nomax":
        p = jnp.exp(logits)
    else:
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
    if mode == "no_pv":
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o_ref[:, 0] = (p[..., :D] / denom).astype(o_ref.dtype)
        return
    out = jax.lax.dot_general(
        p.astype(vals.dtype), vals, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if mode in ("full", "nomax"):
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = out / denom
    o_ref[:, 0] = out.astype(o_ref.dtype)


SCALE = D ** -0.5


def run(mode, q2, k2, v2, rf, beta, bias, rb=RB, tg=TG):
    tgs = tg * S
    grid = (H, B // rb, G // tg)
    row_spec = pl.BlockSpec((rb, 1, tgs, D), lambda h, b, j: (b, h, j, 0),
                            memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((rb, 1, C, D), lambda h, b, j: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, tgs, tgs + C), lambda h, b, j: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kern, scale=SCALE, mode=mode),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, cd_spec, cd_spec, bias_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(q2.shape, q2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(q2, k2, v2, rf, beta, bias)


from _bench_util import timeit_loop as timeit


def main():
    rng = np.random.default_rng(0)
    q2 = jnp.asarray(rng.normal(size=(B, H, G * S, D)), jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(B, H, G * S, D)), jnp.bfloat16)
    v2 = jnp.asarray(rng.normal(size=(B, H, G * S, D)), jnp.bfloat16)
    rf = jnp.asarray(rng.normal(size=(B, H, C, D)), jnp.bfloat16)
    beta = jnp.asarray(rng.normal(size=(B, H, C, D)), jnp.bfloat16)
    t = np.arange(TGS)
    vis = np.concatenate(
        [(t[:, None] // S) == (t[None, :] // S), np.ones((TGS, C), bool)], 1)
    bias = jnp.asarray(np.where(vis, 0.0, MASK_VAL), jnp.float32)
    bias = jnp.broadcast_to(bias, (H, TGS, TGS + C))

    for mode in ("io", "mm_only", "no_pv", "nomax", "full"):
        for rb in (4, 8):
            try:
                ms = timeit(functools.partial(run, mode, rb=rb),
                            q2, k2, v2, rf, beta, bias)
                print(f"{mode:8s} rb={rb}  {ms:7.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{mode:8s} rb={rb}  FAILED {type(e).__name__}: "
                      f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
