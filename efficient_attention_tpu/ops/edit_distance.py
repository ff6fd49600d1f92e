"""Device-side batched Levenshtein edit paths — the libnat_cuda twin.

Reference surface: ``fairseq/fairseq/clib/libnat_cuda/edit_dist.cu`` /
``binding.cpp`` exposes three device ops consumed by the Levenshtein
transformer (``fairseq/fairseq/models/nat/levenshtein_utils.py:36-170``):

* ``levenshtein_distance(source, target, source_length, target_length)``
  → ``operations [B, S+T]`` — per-pair DP (substitution cost 2, ins/del
  cost 1) followed by a backtrace emitting op codes 1=insertion,
  2=deletion, 3=keep, left-aligned and 0-padded
  (``edit_dist.cu:85-166``).
* ``generate_deletion_labels(source, operations)`` → ``[B, S]`` 0/1
  labels over source positions (``edit_dist.cu:17-43``).
* ``generate_insertion_labels(target, operations)`` → ``([B, T] counts,
  [B, T] masks)`` — #insertions before each kept target token, and a
  mask of inserted positions (``edit_dist.cu:45-83``).

The CUDA kernels are one-thread-per-sentence scalar loops.  The TPU
design here is different in both phases:

* **DP as a row scan with an associative prefix-min.**  The row
  recurrence ``D[i,j] = min(c[j], D[i,j-1]+1)`` with
  ``c[j] = min(D[i-1,j]+1, D[i-1,j-1]+2*mismatch)`` unrolls to
  ``D[i,j] = j + cummin(c[k]-k)[j]`` — so one ``lax.scan`` step over
  ``i`` computes a whole row with ``lax.associative_scan(minimum)``,
  vectorized over the batch and the ``T+1`` lanes (VPU-shaped work,
  static shapes, no data-dependent control flow).
* **Backtrace as a fixed-length pointer scan.**  ``S+T`` scan steps move
  per-batch ``(i, j)`` cursors through the stacked table with batched
  gathers; ops are collected last-op-first and left-aligned with a
  vectorized shift, matching the CUDA kernel's in-place "moving to the
  left" pass.
* **Label generation as masked compactions** (cumsum ranks + scatter
  with ``mode='drop'``) instead of the sequential k/u/m counters.

Everything is jittable and shape-static; a NumPy mirror of the CUDA
algorithm gates parity in ``tests/test_edit_distance.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _dp_table(source, target, source_length, target_length):
    """Full DP table ``[B, S+1, T+1]`` (int32).

    Matches the CUDA recurrence (``edit_dist.cu:107-123``): border
    ``D[i,0]=i / D[0,j]=j``, interior
    ``D[i,j] = min(D[i-1,j]+1, D[i,j-1]+1, D[i-1,j-1]+2*(s[i-1]!=t[j-1]))``.
    Cells beyond (source_length, target_length) are computed over padding
    tokens but never read — the backtrace starts at the true lengths and
    only moves down/left, exactly like the CUDA kernel, so per-pair
    lengths need no masking here.
    """
    B, S = source.shape
    T = target.shape[1]
    del source_length, target_length  # lengths only matter to backtrace
    jcol = jnp.arange(T + 1, dtype=jnp.int32)
    row0 = jnp.broadcast_to(jcol, (B, T + 1))

    # mismatch[b, i, j] for 1-based i, j
    mism = (source[:, :, None] != target[:, None, :]).astype(jnp.int32)

    def step(prev_row, xs):
        i1, mrow = xs  # i1: current row index (1-based); mrow: [B, T]
        sub = prev_row[:, :-1] + 2 * mrow              # D[i-1,j-1] + sub
        up = prev_row[:, 1:] + 1                       # D[i-1,j]   + 1
        c = jnp.minimum(sub, up)                       # [B, T] for j>=1
        c = jnp.concatenate(
            [jnp.full((B, 1), i1, jnp.int32), c], axis=1)  # c[0] = D[i,0]
        shifted = c - jcol[None, :]
        run = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
        row = run + jcol[None, :]
        return row, row

    i1s = jnp.arange(1, S + 1, dtype=jnp.int32)
    _, rows = jax.lax.scan(step, row0, (i1s, jnp.swapaxes(mism, 0, 1)))
    table = jnp.concatenate([row0[None], rows], axis=0)  # [S+1, B, T+1]
    return jnp.swapaxes(table, 0, 1)


def levenshtein_distance(source, target, source_length, target_length):
    """Batched edit-path op codes ``[B, S+T]`` (0 pad / 1 ins / 2 del /
    3 keep), the device twin of ``libnat_cuda.levenshtein_distance``."""
    source = source.astype(jnp.int32)
    target = target.astype(jnp.int32)
    B, S = source.shape
    T = target.shape[1]
    L = S + T
    D = _dp_table(source, target, source_length, target_length)
    barange = jnp.arange(B)

    def bt_step(carry, _):
        i, j = carry
        done = (i == 0) & (j == 0)
        cur = D[barange, i, j]
        left = D[barange, i, jnp.maximum(j - 1, 0)]
        up = D[barange, jnp.maximum(i - 1, 0), j]
        # CUDA preference order (edit_dist.cu:134-155): insertion, then
        # deletion, then diagonal.
        ins = (j > 0) & (left < cur)
        dele = (~ins) & (i > 0) & (up < cur)
        op = jnp.where(done, 0, jnp.where(ins, 1, jnp.where(dele, 2, 3)))
        ni = jnp.where(done | ins, i, i - 1)
        nj = jnp.where(done | dele, j, j - 1)
        return (ni, nj), op.astype(jnp.int32)

    i0 = source_length.astype(jnp.int32)
    j0 = target_length.astype(jnp.int32)
    _, ops_rev = jax.lax.scan(bt_step, (i0, j0), None, length=L)
    ops_rev = jnp.swapaxes(ops_rev, 0, 1)              # [B, L], last-first
    n = jnp.sum(ops_rev != 0, axis=1)                  # path length
    idx = n[:, None] - 1 - jnp.arange(L)[None, :]
    gathered = jnp.take_along_axis(
        ops_rev, jnp.maximum(idx, 0), axis=1)
    return jnp.where(idx >= 0, gathered, 0)


def generate_deletion_labels(source, operations):
    """``[B, S]`` labels: 1 where the k-th non-insertion op deletes the
    k-th source token, 0 where it keeps it
    (``edit_dist.cu:17-43``: ``labels[k] = 3 - op`` over ops != 1)."""
    B, S = source.shape
    ops = operations
    non_ins = (ops != 0) & (ops != 1)
    k = jnp.cumsum(non_ins.astype(jnp.int32), axis=1) - 1
    dest = jnp.where(non_ins, k, S)                    # S → dropped
    vals = jnp.where(non_ins, 3 - ops, 0)
    out = jnp.zeros((B, S), jnp.int32)
    return out.at[jnp.arange(B)[:, None], dest].set(vals, mode="drop")


def generate_insertion_labels(target, operations):
    """``(labels [B, T], masks [B, T])``: for each kept target token the
    number of insertions immediately before it, and a 0/1 mask over
    target positions marking inserted tokens (``edit_dist.cu:45-83``;
    the CUDA loop scans ``operation_size - 1`` entries and skips
    deletions — both mirrored exactly)."""
    B, T = target.shape
    L = operations.shape[1]
    pos_ok = jnp.arange(L) < (L - 1)                   # CUDA's `- 1` bound
    ops = jnp.where(pos_ok[None, :], operations, 0)
    non_del = (ops != 0) & (ops != 2)
    is_ins = ops == 1
    is_keep = ops == 3
    brange = jnp.arange(B)[:, None]

    # masks[m] over the ins/keep-compacted axis
    m = jnp.cumsum(non_del.astype(jnp.int32), axis=1) - 1
    mdest = jnp.where(non_del, m, T)
    masks = jnp.zeros((B, T), jnp.int32)
    masks = masks.at[brange, mdest].set(
        jnp.where(non_del, is_ins.astype(jnp.int32), 0), mode="drop")

    # labels[k]: insertions since the previous keep. cum_ins at a keep
    # position counts insertions strictly before it; the difference of
    # consecutive keeps' cum_ins is the run length.
    cum_ins = jnp.cumsum(is_ins.astype(jnp.int32), axis=1)
    k = jnp.cumsum(is_keep.astype(jnp.int32), axis=1) - 1
    kdest = jnp.where(is_keep, k, T)
    w = jnp.zeros((B, T), jnp.int32)
    w = w.at[brange, kdest].set(
        jnp.where(is_keep, cum_ins, 0), mode="drop")
    prev = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), w[:, :-1]], axis=1)
    nkeep = jnp.sum(is_keep, axis=1)
    labels = jnp.where(jnp.arange(T)[None, :] < nkeep[:, None], w - prev, 0)
    return labels, masks


def get_ins_targets(in_tokens, out_tokens, padding_idx, unk_idx):
    """Jittable twin of ``levenshtein_utils._get_ins_targets`` (CUDA
    branch, ``levenshtein_utils.py:39-56``): returns
    ``(masked_tgt_masks [B,T] bool, masked_tgt_tokens [B,T],
    mask_ins_targets [B,S-1])``."""
    in_masks = in_tokens != padding_idx
    out_masks = out_tokens != padding_idx
    ops = levenshtein_distance(
        in_tokens, out_tokens,
        in_masks.sum(1).astype(jnp.int32),
        out_masks.sum(1).astype(jnp.int32))
    mask_ins_targets, masked_tgt_masks = generate_insertion_labels(
        out_tokens, ops)
    masked_tgt_masks = (masked_tgt_masks != 0) & out_masks
    mask_ins_targets = jnp.where(
        in_masks[:, 1:], mask_ins_targets[:, 1:in_tokens.shape[1]], 0
    ).astype(in_tokens.dtype)
    masked_tgt_tokens = jnp.where(masked_tgt_masks, unk_idx, out_tokens)
    return masked_tgt_masks, masked_tgt_tokens, mask_ins_targets


def get_del_targets(in_tokens, out_tokens, padding_idx):
    """Jittable twin of ``levenshtein_utils._get_del_targets`` (CUDA
    branch, ``levenshtein_utils.py:108-125``): ``[B, S]`` deletion
    labels over the current hypothesis tokens."""
    in_masks = in_tokens != padding_idx
    out_masks = out_tokens != padding_idx
    ops = levenshtein_distance(
        in_tokens, out_tokens,
        in_masks.sum(1).astype(jnp.int32),
        out_masks.sum(1).astype(jnp.int32))
    labels = generate_deletion_labels(in_tokens, ops)
    return jnp.where(in_masks, labels, 0).astype(in_tokens.dtype)
