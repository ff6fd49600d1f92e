"""Back-compat shim: the slope-method timing harness moved into the package
(``efficient_attention_tpu.utils.bench_util``) so ``bench.py`` and the
scripts share one copy."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from efficient_attention_tpu.utils.bench_util import (  # noqa: E402,F401
    _make_loop,
    timeit_loop,
)
