"""Probe: whole-image contiguous blocking for the summary kernel."""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _bench_util import timeit_loop

B, G, DIM, NH, J = 128, 28, 192, 3, 4
D = DIM // NH
HD = DIM
N = G * G
C = (G // J) ** 2


def make(variant, rb):
    def _kernel(qkv_ref, rf_ref, beta_ref, *, rb, n, c, gw, j, nh, d):
        hd = nh * d
        ct = qkv_ref.dtype
        n_idx = jax.lax.broadcasted_iota(jnp.int32, (c, n), 1)
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (c, n), 0)
        chunk_of = (n_idx // (gw * j)) * (gw // j) + (n_idx % gw) // j
        P = (chunk_of == c_idx).astype(jnp.float32)          # [C, N]
        Pb = jnp.broadcast_to(P[None], (rb, c, n))
        Pmb = Pb / float(j * j)
        bdims = (((2,), (1,)), ((0,), (0,)))

        def dot(a, b, dims, cast=True):
            t = ct if cast else jnp.float32
            return jax.lax.dot_general(a.astype(t), b.astype(t), dims,
                                       preferred_element_type=jnp.float32)

        strip = qkv_ref[...]                                  # [RB, N, 3HD]
        means = dot(Pmb, strip, bdims)                        # [RB, C, 3HD]
        rf_k = means[:, :, hd:2 * hd]
        if variant == "floor":
            rf_ref[...] = rf_k.astype(rf_ref.dtype)
            beta_ref[...] = means[:, :, 2 * hd:].astype(beta_ref.dtype)
            return
        f_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * hd, nh), 0)
        h_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * hd, nh), 1)
        sec = f_idx // hd
        head_of = (f_idx % hd) // d
        S_k = ((sec == 1) & (head_of == h_idx)).astype(jnp.float32)
        S_v = ((sec == 2) & (head_of == h_idx)).astype(jnp.float32)
        PbT = jnp.broadcast_to(P.T[None], (rb, n, c))
        mu = 0.5 * (means[:, :, :hd] + rf_k)
        w_tok = dot(PbT, mu, bdims, cast=False)
        w_full = jnp.pad(w_tok.astype(ct), ((0, 0), (0, 0), (hd, hd)))
        dash = dot(strip * w_full, S_k, (((2,), (0,)), ((), ())))
        norm = dot(strip * strip, S_k, (((2,), (0,)), ((), ())))
        logp = dash - norm                                    # [RB, N, H]
        lp_c = jnp.where(Pb[..., None] > 0, logp[:, None],
                         jnp.float32(-1e30))
        m = jnp.max(lp_c, axis=2)
        m_tok = dot(PbT, m, bdims, cast=False)
        p = jnp.exp(logp - m_tok)
        denom = dot(Pb, p, bdims, cast=False)
        p_lanes = dot(p, S_v, (((2,), (1,)), ((), ())), cast=False)
        pv = dot(Pb, strip * p_lanes.astype(ct), bdims)
        denom_lanes = dot(denom, S_v[2 * hd:, :], (((2,), (1,)), ((), ())),
                          cast=False)
        beta = pv[:, :, 2 * hd:] / denom_lanes
        rf_ref[...] = rf_k.astype(rf_ref.dtype)
        beta_ref[...] = beta.astype(beta_ref.dtype)

    @jax.jit
    def run(qkv):
        grid = (B // rb,)
        kern = functools.partial(_kernel, rb=rb, n=N, c=C, gw=G, j=J,
                                 nh=NH, d=D)
        rf, beta = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec((rb, N, 3 * HD), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((rb, C, HD), lambda b: (b, 0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((B, C, HD), qkv.dtype)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(qkv)
        return rf, beta

    return run


qkv = jnp.ones((B, N, 3 * HD), jnp.bfloat16)
for variant, rb in (("floor", 2), ("floor", 4), ("full", 2), ("full", 4)):
    run = make(variant, rb)

    def f(c):
        rf, bt = run(c)
        return c + (rf.sum() + bt.sum()).astype(c.dtype) * 0

    try:
        ms = timeit_loop(f, qkv)
        print(f"{variant:6s} rb={rb} {ms:7.3f} ms", flush=True)
    except Exception as e:
        print(variant, rb, "FAIL", str(e)[:160], flush=True)
