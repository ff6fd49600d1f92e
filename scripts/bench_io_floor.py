"""Find the real IO floor: XLA copy vs pallas copies with various grids."""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _bench_util import timeit_loop

B, H, N, D = 128, 3, 784, 64


def pallas_copy(q, rb, with_extras=False, extras=None):
    grid = (H, B // rb, 2)
    tgs = N // 2
    row_spec = pl.BlockSpec((rb, 1, tgs, D), lambda h, b, j: (b, h, j, 0),
                            memory_space=pltpu.VMEM)

    if with_extras:
        k2, bias = extras
        bias_spec = pl.BlockSpec((1, tgs, tgs + 49), lambda h, b, j: (h, 0, 0),
                                 memory_space=pltpu.VMEM)

        def kern(q_ref, k_ref, b_ref, o_ref):
            o_ref[:, 0] = q_ref[:, 0]

        return pl.pallas_call(
            kern, grid=grid, in_specs=[row_spec, row_spec, bias_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
        )(q, k2, bias)

    def kern(q_ref, o_ref):
        o_ref[:, 0] = q_ref[:, 0]

    return pl.pallas_call(
        kern, grid=grid, in_specs=[row_spec], out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(q)


def pallas_copy_big(q, rb):
    grid = (B // rb,)
    spec = pl.BlockSpec((rb, H, N, D), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def kern(q_ref, o_ref):
        o_ref[...] = q_ref[...]

    return pl.pallas_call(
        kern, grid=grid, in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(q)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(H, N // 2, N // 2 + 49)), jnp.float32)
    mb = q.size * 2 / 1e6

    t = timeit_loop(lambda x: x + 1, q)
    print(f"xla_add1        {t:7.3f} ms  ({2*mb/t:6.1f} GB/s)", flush=True)
    for rb in (4, 8, 16):
        t = timeit_loop(functools.partial(pallas_copy, rb=rb), q)
        print(f"pallas_rb{rb:<2d}     {t:7.3f} ms  ({2*mb/t:6.1f} GB/s)",
              flush=True)
    t = timeit_loop(
        lambda x: pallas_copy(x, 4, with_extras=True, extras=(k, bias)), q)
    print(f"pallas_extras   {t:7.3f} ms  (unused k + 688KB bias blocks)",
          flush=True)
    for rb in (2, 4):
        t = timeit_loop(functools.partial(pallas_copy_big, rb=rb), q)
        print(f"pallas_big_rb{rb:<2d} {t:7.3f} ms  ({2*mb/t:6.1f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
