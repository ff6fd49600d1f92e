"""NaN forensics: name the first module producing non-finite outputs.

Replaces ``fairseq/nan_detector.py`` (fwd/bwd hooks naming the first
inf/nan-producing module, re-run on grad-norm failure, ``trainer.py:898``).
The JAX equivalent: re-run the failing step under flax's method
interception, checking every module output eagerly; plus a pytree scanner
for params/grads and the global ``jax_debug_nans`` switch.
"""
from __future__ import annotations

import contextlib
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def first_nonfinite_leaf(tree: Any, prefix: str = "") -> Optional[str]:
    """Path of the first non-finite leaf in a pytree (params/grads audit)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                return prefix + jax.tree_util.keystr(path)
    return None


class NanDetector:
    """Intercepts every flax module call and records the first module whose
    output contains inf/nan (``nan_detector.py`` forward-hook analogue).

    Usage (re-run a failing step eagerly)::

        det = NanDetector()
        with det.intercept():
            model.apply(params, x)  # NOT under jit
        print(det.first_bad)       # e.g. 'blocks_3/EVA_0'
    """

    def __init__(self):
        self.first_bad: Optional[str] = None
        self.trace: List[Tuple[str, str]] = []

    def _interceptor(self, next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if self.first_bad is None:
            leaves = jax.tree_util.tree_leaves(out)
            for leaf in leaves:
                if (hasattr(leaf, "dtype")
                        and jnp.issubdtype(leaf.dtype, jnp.floating)
                        and not bool(jnp.isfinite(leaf).all())):
                    name = context.module.path
                    self.first_bad = "/".join(map(str, name)) or type(
                        context.module).__name__
                    self.trace.append((self.first_bad, "non-finite output"))
                    break
        return out

    @contextlib.contextmanager
    def intercept(self):
        with nn.intercept_methods(self._interceptor):
            yield self


@contextlib.contextmanager
def debug_nans():
    """Enable XLA-level nan checking for a scope (``--debug-nans`` analogue)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
