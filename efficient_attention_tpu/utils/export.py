"""Ahead-of-time model export — serialized, runtime-independent artifacts.

The reference ships TorchScript export coverage for its transformer stack
(``fairseq/tests/test_export.py``: script the model, save, reload, run).
The TPU-native form is ``jax.export``: trace the jitted forward once,
lower to StableHLO, and serialize a self-contained artifact that a serving
process can deserialize and call without the model code — the XLA
equivalent of a scripted module.

The artifact pins the platform(s) it was lowered for (cpu/tpu); export
on the platform you serve on, or pass ``platforms=("cpu", "tpu")`` to
lower for both.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax


def export_apply(apply_fn: Callable, params: Any, *example_args,
                 platforms: Optional[Sequence[str]] = None,
                 **apply_kwargs) -> bytes:
    """Serialize ``apply_fn(params, *example_args, **apply_kwargs)``.

    ``params`` is baked into the artifact as a captured constant (the
    TorchScript analogy: weights ride inside the scripted module), so the
    caller later supplies only the data arguments.
    """
    from jax import export as jex

    def fwd(*data_args):
        return apply_fn(params, *data_args, **apply_kwargs)

    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exported = jex.export(jax.jit(fwd), **kw)(*example_args)
    return bytes(exported.serialize())


def load_exported(data: bytes) -> Callable:
    """Deserialize an :func:`export_apply` artifact into a callable taking
    the same data arguments the export traced."""
    from jax import export as jex

    exported = jex.deserialize(bytearray(data))
    return exported.call
