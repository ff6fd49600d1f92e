"""Localize the summary kernel's cost: time pruned variants on-chip."""
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
SGS = J * G
WC = G // J
HC = G // J
RB = 16


def make(variant):
    def _kernel(qkv_ref, rf_ref, beta_ref, *, rb, sgs, wc, gw, j, nh, d):
        hd = nh * d
        ct = qkv_ref.dtype
        n_idx = jax.lax.broadcasted_iota(jnp.int32, (wc, sgs), 1)
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (wc, sgs), 0)
        P = ((n_idx % gw) // j == c_idx).astype(jnp.float32)
        Pb = jnp.broadcast_to(P[None], (rb, wc, sgs))
        Pmb = Pb / float(j * j)
        PbT = jnp.broadcast_to(P.T[None], (rb, sgs, wc))
        f_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * hd, nh), 0)
        h_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * hd, nh), 1)
        sec = f_idx // hd
        head_of = (f_idx % hd) // d
        S_k = ((sec == 1) & (head_of == h_idx)).astype(jnp.float32)
        S_v = ((sec == 2) & (head_of == h_idx)).astype(jnp.float32)
        bdims = (((2,), (1,)), ((0,), (0,)))

        def dot(a, b, dims, cast=True):
            t = ct if cast else jnp.float32
            return jax.lax.dot_general(a.astype(t), b.astype(t), dims,
                                       preferred_element_type=jnp.float32)

        strip = qkv_ref[:, 0]
        means = dot(Pmb, strip, bdims)
        rf_k = means[:, :, hd:2 * hd]
        if variant == "floor":  # read + means only
            rf_ref[:, 0] = rf_k.astype(rf_ref.dtype)
            beta_ref[:, 0] = means[:, :, 2 * hd:].astype(beta_ref.dtype)
            return
        mu = 0.5 * (means[:, :, :hd] + rf_k)
        w_tok = dot(PbT, mu, bdims, cast=False)
        w_full = jnp.pad(w_tok.astype(ct), ((0, 0), (0, 0), (hd, hd)))
        dash = dot(strip * w_full, S_k, (((2,), (0,)), ((), ())))
        norm = dot(strip * strip, S_k, (((2,), (0,)), ((), ())))
        logp = dash - norm
        if variant == "logp":  # through dash/norm
            rf_ref[:, 0] = rf_k.astype(rf_ref.dtype)
            beta_ref[:, 0] = (means[:, :, 2 * hd:]
                              + dot(Pb, logp, bdims, cast=False) @ S_v[
                                  2 * hd:].T).astype(beta_ref.dtype)
            return
        lp_c = jnp.where(Pb[..., None] > 0, logp[:, None],
                         jnp.float32(-1e30))
        m = jnp.max(lp_c, axis=2)
        m_tok = dot(PbT, m, bdims, cast=False)
        p = jnp.exp(logp - m_tok)
        denom = dot(Pb, p, bdims, cast=False)
        if variant == "softmax":  # through softmax, skip p_lanes/pv
            rf_ref[:, 0] = rf_k.astype(rf_ref.dtype)
            beta_ref[:, 0] = (means[:, :, 2 * hd:] + dot(
                denom, S_v[2 * hd:].T, (((2,), (0,)), ((), ())),
                cast=False)).astype(beta_ref.dtype)
            return
        p_lanes = dot(p, S_v, (((2,), (1,)), ((), ())), cast=False)
        pv = dot(Pb, strip * p_lanes.astype(ct), bdims)
        denom_lanes = dot(denom, S_v[2 * hd:, :], (((2,), (1,)), ((), ())),
                          cast=False)
        beta = pv[:, :, 2 * hd:] / denom_lanes
        rf_ref[:, 0] = rf_k.astype(rf_ref.dtype)
        beta_ref[:, 0] = beta.astype(beta_ref.dtype)

    @jax.jit
    def run(qkv):
        qkv4 = qkv.reshape(B, HC, SGS, 3 * HD)
        grid = (B // RB, HC)
        kern = functools.partial(_kernel, rb=RB, sgs=SGS, wc=WC, gw=G, j=J,
                                 nh=NH, d=D)
        rf, beta = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec((RB, 1, SGS, 3 * HD),
                                   lambda b, r: (b, r, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((RB, 1, WC, HD),
                                    lambda b, r: (b, r, 0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((B, HC, WC, HD), qkv.dtype)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(qkv4)
        return rf, beta

    return run


qkv = jnp.ones((B, G * G, 3 * HD), jnp.bfloat16)
for variant in ("floor", "logp", "softmax", "full"):
    run = make(variant)

    def f(c):
        rf, bt = run(c)
        return c + (rf.sum() + bt.sum()).astype(c.dtype) * 0

    try:
        ms = timeit_loop(f, qkv)
        print(f"{variant:8s} {ms:7.3f} ms", flush=True)
    except Exception as e:
        print(variant, "FAIL", str(e)[:200], flush=True)
