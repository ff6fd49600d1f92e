"""Golden tests for the numerics layer (ops/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.ops import windows as W
from efficient_attention_tpu.ops.log_ops import log_add_exp, log_avg_exp, log_matmul_exp
from efficient_attention_tpu.ops.pooling import (
    adaptive_avg_pool_2d,
    adaptive_pool_matrix,
    segment_mean_landmarks,
)
from efficient_attention_tpu.ops.random_features import (
    favorp_projection,
    linear_attention,
    orthogonal_gaussian_matrix,
    prm_projection,
)
from efficient_attention_tpu.ops.rpe import local_2d_rpe_index, t5_bucket_table


class TestWindows:
    def test_pad_to_multiple(self):
        x = jnp.ones((2, 10, 4))
        y = W.pad_to_multiple(x, 4, axis=-2)
        assert y.shape == (2, 12, 4)
        assert jnp.all(y[:, 10:] == 0)
        assert W.pad_to_multiple(x, 5, axis=-2).shape == (2, 10, 4)

    def test_window_1d_no_halo(self):
        x = jnp.arange(2 * 1 * 8 * 3, dtype=jnp.float32).reshape(2, 1, 8, 3)
        out = W.window_1d_partition(x, 4)
        assert out.shape == (2, 1, 2, 4, 3)
        np.testing.assert_array_equal(out[0, 0, 1, 0], x[0, 0, 4])
        merged = W.window_1d_merge(out)
        np.testing.assert_array_equal(merged, x)

    def test_window_1d_halo_contents(self):
        # hand-derived: n=8, w=4, e=2: window 0 covers padded [-2..5]
        x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8, 1)
        out = W.window_1d_partition(x, 4, ext_window_size=2, pad_val=-1.0)
        assert out.shape == (1, 1, 2, 8, 1)
        np.testing.assert_array_equal(
            out[0, 0, 0, :, 0], [-1, -1, 0, 1, 2, 3, 4, 5])
        np.testing.assert_array_equal(
            out[0, 0, 1, :, 0], [2, 3, 4, 5, 6, 7, -1, -1])

    def test_causal_window_1d(self):
        x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8, 1)
        out = W.causal_window_1d_partition(x, 4, ext_window_size=4, pad_val=-1.0)
        assert out.shape == (1, 1, 2, 8, 1)
        np.testing.assert_array_equal(
            out[0, 0, 0, :, 0], [-1, -1, -1, -1, 0, 1, 2, 3])
        np.testing.assert_array_equal(
            out[0, 0, 1, :, 0], [0, 1, 2, 3, 4, 5, 6, 7])

    def test_window_2d_roundtrip(self):
        x = jnp.arange(1 * 6 * 6 * 2, dtype=jnp.float32).reshape(1, 6, 6, 2)
        out = W.window_2d_partition(x, 3)
        assert out.shape == (1, 4, 9, 2)
        back = W.window_2d_merge(out, 3, (6, 6))
        np.testing.assert_array_equal(back, x)

    def test_window_2d_halo(self):
        # 4x4 grid, w=2, e=1: window (0,0) covers rows/cols -1..2 of padding
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        out = W.window_2d_partition(x, 2, ext_window_size=1, pad_val=-1.0)
        assert out.shape == (1, 4, 16, 1)
        first = out[0, 0, :, 0].reshape(4, 4)
        np.testing.assert_array_equal(first[0], [-1, -1, -1, -1])
        np.testing.assert_array_equal(first[1], [-1, 0, 1, 2])
        np.testing.assert_array_equal(first[2], [-1, 4, 5, 6])
        # windows are ordered row-major over (gh, gw)
        second = out[0, 1, :, 0].reshape(4, 4)
        np.testing.assert_array_equal(second[1], [1, 2, 3, -1])


class TestLogOps:
    def test_log_add_exp(self):
        a, b = jnp.array([1.0, 5.0]), jnp.array([2.0, 3.0])
        expected = np.log(np.exp([1.0, 5.0]) + np.exp([2.0, 3.0]))
        np.testing.assert_allclose(log_add_exp(a, b), expected, rtol=1e-4)

    def test_log_add_exp_subtract(self):
        a, b = jnp.array([5.0]), jnp.array([3.0])
        expected = np.log(np.exp(5.0) - np.exp(3.0))
        np.testing.assert_allclose(
            log_add_exp(a, b, mask=(1, -1)), expected, rtol=1e-3)

    def test_log_matmul_exp(self):
        k = jax.random.PRNGKey(1)
        v1 = jax.random.normal(k, (3, 4))
        v2 = jax.random.normal(jax.random.PRNGKey(2), (4, 5))
        expected = np.log(np.exp(np.asarray(v1)) @ np.exp(np.asarray(v2)))
        np.testing.assert_allclose(log_matmul_exp(v1, v2), expected, atol=1e-4)

    def test_log_avg_exp(self):
        t = jnp.array([[0.0, 1.0, 2.0]])
        expected = np.log(np.mean(np.exp([0.0, 1.0, 2.0])))
        np.testing.assert_allclose(log_avg_exp(t, axis=-1)[0], expected, rtol=1e-4)


class TestRandomFeatures:
    def test_prm_projection_softmax_identity(self):
        """normalize=True gives softmax over keys of <w, k>/sqrt(d) - |k|^2/2sqrt(d)."""
        key = jax.random.PRNGKey(0)
        data = jax.random.normal(key, (2, 3, 8, 16))
        proj = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 16))
        out = prm_projection(data, proj, normalize=True)
        assert out.shape == (2, 3, 4, 8)
        np.testing.assert_allclose(np.sum(np.asarray(out), -1), 1.0, rtol=1e-5)
        # manual recompute
        d = 16
        dd = np.einsum("bhmd,bhnd->bhmn", np.asarray(proj),
                       np.asarray(data)) * d**-0.5
        norm = (d**-0.5) * np.sum(np.asarray(data) ** 2, -1)[:, :, None, :] / 2
        man = np.exp(dd - norm)
        man = man / man.sum(-1, keepdims=True)
        np.testing.assert_allclose(out, man, atol=1e-5)

    def test_favorp_unbiasedness(self):
        """E[phi(q)^T phi(k)] ~ exp(q.k/sqrt(d)) for many random features."""
        key = jax.random.PRNGKey(0)
        d = 16
        q = jax.random.normal(key, (1, 1, 4, d)) * 0.3
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 4, d)) * 0.3
        proj = jax.random.normal(jax.random.PRNGKey(2), (1, 8192, d))
        qp = favorp_projection(q, proj, is_query=True, eps=0.0)
        kp = favorp_projection(k, proj, is_query=False, eps=0.0)
        approx = np.einsum("bhnm,bhjm->bhnj", np.asarray(qp), np.asarray(kp))
        exact = np.exp(
            np.einsum("bhnd,bhjd->bhnj", np.asarray(q), np.asarray(k)) / np.sqrt(d))
        # stabilizers cancel only in ratios; compare normalized rows
        np.testing.assert_allclose(
            approx / approx.sum(-1, keepdims=True),
            exact / exact.sum(-1, keepdims=True),
            atol=0.05,
        )

    def test_linear_attention_uniform(self):
        """With constant features, linear attention averages values."""
        qp = jnp.ones((1, 1, 5, 7))
        kp = jnp.ones((1, 1, 5, 7))
        v = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 5, 3))
        out = linear_attention(qp, kp, v)
        np.testing.assert_allclose(
            out, jnp.broadcast_to(v.mean(-2, keepdims=True), out.shape), rtol=1e-5)

    def test_orthogonal_matrix(self):
        m = orthogonal_gaussian_matrix(jax.random.PRNGKey(0), 32, 16)
        assert m.shape == (32, 16)
        # rows within each 16-block are orthogonal
        block = np.asarray(m[:16])
        normed = block / np.linalg.norm(block, axis=1, keepdims=True)
        gram = normed @ normed.T
        np.testing.assert_allclose(gram, np.eye(16), atol=1e-5)


class TestPooling:
    def test_adaptive_pool_matches_torch_semantics(self):
        mat = adaptive_pool_matrix(10, 3)
        # torch AdaptiveAvgPool1d(3) on len 10: segments [0:4], [3:7], [6:10]
        assert mat.shape == (3, 10)
        np.testing.assert_allclose(mat.sum(1), 1.0, rtol=1e-6)
        np.testing.assert_allclose(mat[0, :4], 0.25)
        np.testing.assert_allclose(mat[1, 3:7], 0.25)
        np.testing.assert_allclose(mat[2, 6:], 0.25)

    def test_adaptive_pool_2d_uniform(self):
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4)
        out = adaptive_avg_pool_2d(x, 2)
        np.testing.assert_allclose(
            out[0], [[2.5, 4.5], [10.5, 12.5]], rtol=1e-6)

    def test_segment_mean_landmarks_nondivisible(self):
        # n=10, landmarks=4: segs=2, num_k=2 -> sizes [2, 2, 3, 3]
        x = jnp.arange(10, dtype=jnp.float32).reshape(1, 1, 10, 1)
        out = segment_mean_landmarks(x, 4)
        np.testing.assert_allclose(
            out[0, 0, :, 0], [0.5, 2.5, 5.0, 8.0], rtol=1e-6)


class TestRPE:
    def test_t5_buckets_causal(self):
        tbl = t5_bucket_table(4, 4, causal=True, num_buckets=16, max_distance=8)
        assert tbl.shape == (4, 4)
        # diagonal: rel 0 -> bucket 0; future positions clamp to 0 too
        assert tbl[0, 0] == 0
        assert tbl[3, 0] == 3  # rel -3 -> n=3 < max_exact=8 -> bucket 3
        assert tbl[0, 3] == 0  # future clamps

    def test_t5_buckets_bidirectional(self):
        tbl = t5_bucket_table(4, 4, causal=False, num_buckets=32, max_distance=8)
        # negative rel (past) bucket n; positive rel offset by num_buckets//2
        assert tbl[3, 0] == 3
        assert tbl[0, 3] == 16 + 3

    def test_local_2d_rpe_index_bounds(self):
        idx, size = local_2d_rpe_index(3, 1)
        assert idx.shape == (9, 25)
        assert idx.min() >= 0 and idx.max() < size
        # symmetric pairs map to distinct entries unless same offset
        assert idx[0, 0] != idx[8, 24] or (3 == 1)


class TestMiscOps:


    def test_future_mask(self):
        from efficient_attention_tpu.ops.misc import future_mask

        m = future_mask(3)
        assert m[0, 1] == -np.inf and m[1, 0] == 0 and m[2, 2] == 0


class TestContextWindowBlocks:
    def test_sliding_blocks(self):
        from efficient_attention_tpu.data.lm_context_window import (
            context_window_blocks,
        )

        tokens = np.arange(20)
        blocks = list(context_window_blocks(tokens, tokens_per_sample=8,
                                            context_window=3, pad_idx=-1))
        # first block scores everything; later blocks carry 3 context tokens
        b0, m0 = blocks[0]
        np.testing.assert_array_equal(b0, np.arange(8))
        assert m0.all()
        b1, m1 = blocks[1]
        np.testing.assert_array_equal(b1[:3], [5, 6, 7])  # context
        assert not m1[:3].any() and m1[3:].all()
        # every token scored exactly once
        scored = []
        for b, m in blocks:
            scored.extend(np.asarray(b)[m & (b >= 0)].tolist())
        assert sorted(set(scored)) == list(range(20))
        assert len(scored) == len(set(scored))
