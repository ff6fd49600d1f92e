"""Parity gate for ops/edit_distance.py vs a NumPy mirror of the CUDA
algorithm (`fairseq/fairseq/clib/libnat_cuda/edit_dist.cu`): same DP
costs (sub 2 / ins 1 / del 1), same backtrace preference order
(insertion, deletion, diagonal), same left-aligned op layout, same label
loops including the `operation_size - 1` insertion-scan bound."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.ops import edit_distance as ed


def _mirror_levenshtein(src, tgt, slen, tlen):
    """One-sentence scalar mirror of levenshtein_distance_kernel."""
    S, T = len(src), len(tgt)
    h, r = int(slen), int(tlen)
    D = np.zeros((S + 1, T + 1), np.int64)
    for i in range(h + 1):
        D[i, 0] = i
    for j in range(r + 1):
        D[0, j] = j
    for i in range(1, h + 1):
        for j in range(1, r + 1):
            D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                          D[i - 1, j - 1] + 2 * (src[i - 1] != tgt[j - 1]))
    ops = np.zeros(S + T, np.int64)
    i, j, o = h, r, h + r
    while i >= 0 and j >= 0:
        if i == 0 and j == 0:
            break
        if j > 0 and D[i, j - 1] < D[i, j]:
            o -= 1
            ops[o] = 1
            j -= 1
        elif i > 0 and D[i - 1, j] < D[i, j]:
            o -= 1
            ops[o] = 2
            i -= 1
        else:
            o -= 1
            ops[o] = 3
            i -= 1
            j -= 1
    out = np.zeros(S + T, np.int64)
    for k in range(h + r):
        out[k] = ops[k + o] if k + o < h + r else 0
    return out


def _mirror_del_labels(S, ops):
    labels = np.zeros(S, np.int64)
    k = 0
    for op in ops:
        if op == 0:
            break
        if op == 1:
            continue
        labels[k] = 3 - op
        k += 1
    return labels


def _mirror_ins_labels(T, ops):
    labels = np.zeros(T, np.int64)
    masks = np.zeros(T, np.int64)
    k = u = m = 0
    for op in ops[:-1]:
        if op == 0:
            break
        if op == 2:
            continue
        if op == 1:
            masks[m] = 1
            u += 1
            m += 1
        else:
            labels[k] = u
            masks[m] = 0
            k += 1
            m += 1
            u = 0
    return labels, masks


def _random_batch(rng, B, S, T, vocab=5):
    src = rng.integers(1, vocab, (B, S)).astype(np.int32)
    tgt = rng.integers(1, vocab, (B, T)).astype(np.int32)
    slen = rng.integers(0, S + 1, B).astype(np.int32)
    tlen = rng.integers(0, T + 1, B).astype(np.int32)
    return src, tgt, slen, tlen


@pytest.mark.parametrize("B,S,T", [(8, 6, 9), (4, 12, 7), (16, 5, 5)])
def test_levenshtein_ops_match_mirror(B, S, T):
    rng = np.random.default_rng(0)
    src, tgt, slen, tlen = _random_batch(rng, B, S, T)
    got = np.asarray(jax.jit(ed.levenshtein_distance)(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(slen), jnp.asarray(tlen)))
    for b in range(B):
        want = _mirror_levenshtein(src[b], tgt[b], slen[b], tlen[b])
        np.testing.assert_array_equal(got[b], want, err_msg=f"row {b}")


def test_labels_match_mirror():
    rng = np.random.default_rng(1)
    B, S, T = 12, 8, 10
    src, tgt, slen, tlen = _random_batch(rng, B, S, T)
    ops = jax.jit(ed.levenshtein_distance)(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(slen), jnp.asarray(tlen))
    dl = np.asarray(jax.jit(ed.generate_deletion_labels)(
        jnp.asarray(src), ops))
    il, im = jax.jit(ed.generate_insertion_labels)(jnp.asarray(tgt), ops)
    il, im, ops_np = np.asarray(il), np.asarray(im), np.asarray(ops)
    for b in range(B):
        np.testing.assert_array_equal(dl[b], _mirror_del_labels(S, ops_np[b]))
        wl, wm = _mirror_ins_labels(T, ops_np[b])
        np.testing.assert_array_equal(il[b], wl)
        np.testing.assert_array_equal(im[b], wm)


def test_maximal_path_hits_scan_bound():
    """hyp_len=S, tgt_len=T, fully disjoint tokens → path length S+T, no
    zero terminator; the CUDA insertion scan reads only ops[:-1] — the
    twin must mirror that exactly."""
    src = np.array([[1, 1]], np.int32)
    tgt = np.array([[2, 2, 2]], np.int32)
    slen = np.array([2], np.int32)
    tlen = np.array([3], np.int32)
    ops = ed.levenshtein_distance(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(slen), jnp.asarray(tlen))
    ops_np = np.asarray(ops)
    assert (ops_np[0] != 0).all()
    np.testing.assert_array_equal(
        ops_np[0], _mirror_levenshtein(src[0], tgt[0], 2, 3))
    il, im = ed.generate_insertion_labels(jnp.asarray(tgt), ops)
    wl, wm = _mirror_ins_labels(3, ops_np[0])
    np.testing.assert_array_equal(np.asarray(il)[0], wl)
    np.testing.assert_array_equal(np.asarray(im)[0], wm)


def test_consumer_target_builders():
    """get_ins_targets/get_del_targets mirror the CUDA branch of
    levenshtein_utils: masking, the [:, 1:S] slice, unk filling."""
    pad, unk = 0, 3
    rng = np.random.default_rng(2)
    B, S, T = 6, 7, 9
    src, tgt, slen, tlen = _random_batch(rng, B, S, T)
    src = src.copy()
    tgt = tgt.copy()
    for b in range(B):
        src[b, slen[b]:] = pad
        tgt[b, tlen[b]:] = pad
    mtm, mtt, mit = jax.jit(
        ed.get_ins_targets, static_argnums=(2, 3))(
        jnp.asarray(src), jnp.asarray(tgt), pad, unk)
    wdt = jax.jit(ed.get_del_targets, static_argnums=(2,))(
        jnp.asarray(src), jnp.asarray(tgt), pad)
    mtm, mtt, mit, wdt = map(np.asarray, (mtm, mtt, mit, wdt))
    for b in range(B):
        ops = _mirror_levenshtein(src[b], tgt[b], slen[b], tlen[b])
        il, im = _mirror_ins_labels(T, ops)
        dl = _mirror_del_labels(S, ops)
        exp_mask = (im != 0) & (tgt[b] != pad)
        np.testing.assert_array_equal(mtm[b], exp_mask)
        np.testing.assert_array_equal(
            mtt[b], np.where(exp_mask, unk, tgt[b]))
        exp_mit = np.where(src[b, 1:] != pad, il[1:S], 0)
        np.testing.assert_array_equal(mit[b], exp_mit)
        np.testing.assert_array_equal(
            wdt[b], np.where(src[b] != pad, dl, 0))
    # deletion labels never mark pad, insertion counts never negative
    assert (mit >= 0).all() and set(np.unique(wdt)) <= {0, 1}
