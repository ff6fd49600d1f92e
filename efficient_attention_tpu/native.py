"""ctypes bindings for the native host helpers (``native/eatpu_native.cpp``).

Replaces the reference's C++/Cython host code (libbleu, libnat, libbase,
ngram_repeat_block, data_utils_fast, token_block_utils_fast — SURVEY §2.3)
with one shared library.  Every binding has a pure-Python fallback in the
corresponding module; these are the fast paths.

Build with ``make -C efficient_attention_tpu/native`` (done automatically on
first import if g++ is available).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_DIR, "libeatpu_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.eatpu_batch_by_size.restype = ctypes.c_int64
    lib.eatpu_batch_by_size.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, i64p]
    lib.eatpu_token_block_slices.restype = ctypes.c_int64
    lib.eatpu_token_block_slices.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p]
    lib.eatpu_bleu_add.restype = None
    lib.eatpu_bleu_add.argtypes = [i64p, ctypes.c_int64, i64p,
                                   ctypes.c_int64, i64p, i64p]
    lib.eatpu_edit_distance.restype = ctypes.c_int64
    lib.eatpu_edit_distance.argtypes = [i64p, ctypes.c_int64, i64p,
                                        ctypes.c_int64]
    lib.eatpu_balanced_assignment.restype = None
    lib.eatpu_balanced_assignment.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float, i64p]
    lib.eatpu_ngram_repeat_block.restype = None
    lib.eatpu_ngram_repeat_block.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
        ctypes.c_int64]
    lib.eatpu_alignment_train.restype = None
    lib.eatpu_alignment_train.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float]
    _lib = lib
    return _lib


def _i64(arr) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.int64)


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(
        ctypes.c_int64 if arr.dtype == np.int64 else ctypes.c_float))


def batch_by_size_native(indices, sizes, max_tokens,
                         max_sentences=None, required_multiple=8
                         ) -> List[np.ndarray]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native lib unavailable")
    indices = _i64(indices)
    sizes = _i64(sizes)
    offsets = np.zeros(len(indices) + 1, np.int64)
    n = lib.eatpu_batch_by_size(
        _ptr(indices), _ptr(sizes), len(indices), int(max_tokens),
        int(max_sentences or 0), int(required_multiple), _ptr(offsets))
    return [indices[offsets[i]:offsets[i + 1]] for i in range(n)]


def bleu_add_native(ref, hyp, match: np.ndarray, total: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native lib unavailable")
    ref, hyp = _i64(ref), _i64(hyp)
    lib.eatpu_bleu_add(_ptr(ref), len(ref), _ptr(hyp), len(hyp),
                       _ptr(match), _ptr(total))


def edit_distance(a, b) -> int:
    lib = get_lib()
    if lib is None:
        # pure-python fallback
        a, b = list(a), list(b)
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            for j, y in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (x != y)))
            prev = cur
        return prev[-1]
    a, b = _i64(a), _i64(b)
    return int(lib.eatpu_edit_distance(_ptr(a), len(a), _ptr(b), len(b)))


def balanced_assignment(scores: np.ndarray, eps: float = 1e-4) -> np.ndarray:
    """Auction-algorithm job assignment (BASE-layer MoE routing,
    ``fairseq/clib/libbase``).  scores: [workers, jobs] -> job per worker."""
    lib = get_lib()
    scores = np.ascontiguousarray(scores, np.float32)
    w, j = scores.shape
    out = np.zeros(w, np.int64)
    if lib is None:
        # greedy python fallback
        taken = set()
        for wi in np.argsort(-scores.max(1)):
            order = np.argsort(-scores[wi])
            for cand in order:
                if cand not in taken:
                    taken.add(cand)
                    out[wi] = cand
                    break
        return out
    lib.eatpu_balanced_assignment(_ptr(scores), w, j, eps, _ptr(out))
    return out


def ngram_repeat_block(tokens: np.ndarray, ngram_size: int,
                       max_banned: int = 64) -> List[List[int]]:
    """Banned next-tokens per row (``fairseq/ngram_repeat_block.py``)."""
    tokens = _i64(tokens)
    n_rows, step_len = tokens.shape
    lib = get_lib()
    if lib is None:
        banned = []
        for r in range(n_rows):
            row = tokens[r].tolist()
            bl = []
            if step_len + 1 >= ngram_size:
                suffix = tuple(row[step_len - ngram_size + 1:])
                for i in range(step_len - ngram_size + 1):
                    if tuple(row[i:i + ngram_size - 1]) == suffix:
                        bl.append(row[i + ngram_size - 1])
            banned.append(bl)
        return banned
    out = np.zeros((n_rows, max_banned), np.int64)
    counts = np.zeros(n_rows, np.int64)
    lib.eatpu_ngram_repeat_block(_ptr(tokens), n_rows, step_len,
                                 ngram_size, _ptr(out), _ptr(counts),
                                 max_banned)
    return [out[r, :counts[r]].tolist() for r in range(n_rows)]


def alignment_train(p_choose: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Monotonic-attention expected alignment on CPU (the reference's
    ``examples/operators/alignment_train_cpu.cpp``); the JAX/TPU twin is
    ``ops/alignment.py:expected_alignment_from_p_choose``."""
    lib = get_lib()
    p = np.ascontiguousarray(p_choose, np.float32)
    b, t, s = p.shape
    out = np.zeros_like(p)
    if lib is None:
        # numpy fallback, same recurrence
        for bi in range(b):
            prev = np.zeros(s, np.float32)
            prev[0] = 1.0
            for ti in range(t):
                row = p[bi, ti]
                cpe = np.concatenate(
                    [[1.0], np.cumprod(1.0 - row)[:-1]]).astype(np.float32)
                denom = np.clip(cpe, eps, 1.0)
                scan = np.cumsum(prev / denom)
                prev = np.clip(scan * row * cpe, 0.0, 1.0)
                out[bi, ti] = prev
        return out
    lib.eatpu_alignment_train(_ptr(p), _ptr(out), b, t, s, eps)
    return out
