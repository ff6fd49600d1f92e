"""ViT model zoo: architectures, stems, registry, train/eval semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.models import create_model, list_models
from efficient_attention_tpu.models.layers import (
    DropPath,
    GatedMlp,
    MlpWithDepthwiseConv,
    OverlapPatchEmbed,
    PatchEmbed,
)

EVA_ARGS = {"window_size": 2, "num_landmarks": 4, "attn_2d": True,
            "use_rpe": True}


class TestRegistry:
    def test_all_archs_registered(self):
        models = list_models()
        for name in ("evit_tiny_p16", "evit_small_p16", "evit_base_p16",
                     "evit_tiny_p8", "evit_small_p8", "evit_base_p8",
                     "evit_tiny_p4", "evit_small_p4",
                     "pvt_nano", "pvt_tiny", "pvt_small", "pvt_medium",
                     "pvt_base", "pvt_large", "pvt_tiny2", "pvt_small2",
                     "pvt_medium2", "pvt_base2", "pvt_large2"):
            assert name in models, name

    def test_unknown_model(self):
        with pytest.raises(KeyError):
            create_model("evit_gigantic")


class TestEfficientTransformer:
    def test_forward_eva(self, rng):
        m = create_model("evit_tiny_p16", attn_name="eva", attn_args=EVA_ARGS,
                         img_size=64, num_classes=10, depth=2)
        x = jax.random.normal(rng, (2, 64, 64, 3))
        params = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        out = m.apply(params, x, deterministic=True)
        assert out.shape == (2, 10)
        assert jnp.isfinite(out).all()

    @pytest.mark.parametrize("stem", ["default", "conv", "hmlp"])
    def test_stems(self, rng, stem):
        m = PatchEmbed(patch_size=16, embed_dim=32, stem_type=stem)
        x = jax.random.normal(rng, (1, 64, 64, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (1, 4, 4, 32)

    def test_glu_mlp(self, rng):
        m = GatedMlp(hidden_features=48, use_glu=True)
        x = jax.random.normal(rng, (2, 5, 24))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 5, 24)

    def test_droppath_train_vs_eval(self, rng):
        dp = DropPath(rate=0.5)
        x = jnp.ones((8, 4))
        out_eval = dp.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(out_eval, x)
        out_train = dp.apply({}, x, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(0)})
        # rows are either 0 or 2x (inverted scaling)
        vals = np.unique(np.asarray(out_train))
        assert set(np.round(vals, 4)).issubset({0.0, 2.0})

    def test_train_mode_runs(self, rng):
        m = create_model("evit_tiny_p16", attn_name="eva", attn_args=EVA_ARGS,
                         img_size=64, num_classes=10, depth=2,
                         drop_path_rate=0.1, drop_rate=0.1)
        x = jax.random.normal(rng, (2, 64, 64, 3))
        params = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        out = m.apply(params, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1),
                            "sample": jax.random.PRNGKey(2)})
        assert jnp.isfinite(out).all()


class TestPVT:
    def test_forward_multiscale_eva(self, rng):
        """PVT stages exercise 2-D EVA at multiple sequence lengths; the
        final 49-token stage falls back to softmax (``pvt_legacy.py:78-87``)."""
        m = create_model(
            "pvt_nano", attn_name="eva",
            attn_args={"window_size": 2, "num_landmarks": 4, "attn_2d": True},
            img_size=64, num_classes=10)
        x = jax.random.normal(rng, (2, 64, 64, 3))
        params = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        out = m.apply(params, x, deterministic=True)
        assert out.shape == (2, 10)
        assert jnp.isfinite(out).all()

    def test_conv_patchify(self, rng):
        m = OverlapPatchEmbed(embed_dim=32, use_conv_patchify=True)
        x = jax.random.normal(rng, (1, 32, 32, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        out, hw = m.apply(params, x)
        assert out.shape == (1, 8, 8, 32)

    def test_kernel_size_forwarding(self, rng):
        """PVT passes kernel_size=sr_ratio to attentions that accept it
        (``pvt_legacy.py:83-84``) — LARA accepts kernel_size."""
        m = create_model(
            "pvt_nano", attn_name="lara",
            attn_args={"num_landmarks": 4, "proposal_gen": "pool",
                       "kernel_size": 0},
            img_size=64, num_classes=10)
        x = jax.random.normal(rng, (1, 64, 64, 3))
        params = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        out = m.apply(params, x, deterministic=True)
        assert jnp.isfinite(out).all()


class TestMlpDWConv:
    def test_shapes(self, rng):
        m = MlpWithDepthwiseConv(hidden_features=64)
        x = jax.random.normal(rng, (2, 8, 8, 32))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 8, 8, 32)
