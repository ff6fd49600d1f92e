"""DeiT augmentation parity: RandAugment ops, color jitter, random erasing,
CIFAR loaders (reference ``vit/datasets.py:28-81``, ``vit/main.py:105-124``)."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from efficient_attention_tpu.data.erasing import (
    ErasingConfig,
    apply_random_erasing,
)
from efficient_attention_tpu.data.randaugment import (
    RandAugment,
    build_train_augment,
    color_jitter,
)


def _img(seed=0, size=32):
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 256, (size, size, 3), dtype=np.uint8))


class TestRandAugment:
    def test_config_parsing(self):
        ra = RandAugment.from_config("rand-m9-mstd0.5-inc1")
        assert ra.magnitude == 9.0 and ra.mstd == 0.5 and ra.num_layers == 2
        ra2 = RandAugment.from_config("rand-m5-n3-p0.7-mstd0.0")
        assert (ra2.magnitude, ra2.num_layers, ra2.prob) == (5.0, 3, 0.7)

    def test_bad_config_rejected(self):
        with pytest.raises(AssertionError):
            RandAugment.from_config("augmix-m3")

    def test_posterize_reduces_bit_depth(self):
        ra = RandAugment()
        fn = dict((n, f) for n, f in ra.ops)["PosterizeIncreasing"]
        out = fn(_img(), 10.0, np.random.default_rng(0))
        arr = np.asarray(out)
        # 1 bit kept -> at most 2 distinct values per channel
        assert all(len(np.unique(arr[..., c])) <= 2 for c in range(3))

    def test_solarize_threshold(self):
        ra = RandAugment()
        fn = dict(ra.ops)["SolarizeIncreasing"]
        img = _img()
        out = np.asarray(fn(img, 10.0, np.random.default_rng(0)))
        # threshold 0 -> every pixel inverted
        np.testing.assert_array_equal(out, 255 - np.asarray(img))

    def test_solarize_add_only_below_threshold(self):
        ra = RandAugment()
        fn = dict(ra.ops)["SolarizeAdd"]
        img = _img()
        arr = np.asarray(img).astype(np.int32)
        out = np.asarray(fn(img, 10.0, np.random.default_rng(0))).astype(
            np.int32)
        below = arr < 128
        np.testing.assert_array_equal(
            out[below], np.clip(arr[below] + 110, 0, 255))
        np.testing.assert_array_equal(out[~below], arr[~below])

    def test_enhance_identity_at_zero_magnitude(self):
        ra = RandAugment()
        img = _img()
        for name in ("ColorIncreasing", "ContrastIncreasing",
                     "BrightnessIncreasing", "SharpnessIncreasing"):
            out = dict(ra.ops)[name](img, 0.0, np.random.default_rng(0))
            np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                       atol=1)

    def test_translate_moves_pixels(self):
        ra = RandAugment()
        img = Image.new("RGB", (32, 32), (0, 0, 0))
        img.putpixel((16, 16), (255, 255, 255))
        out = np.asarray(dict(ra.ops)["TranslateXRel"](
            img, 10.0, np.random.default_rng(0)))
        assert out[16, 16].sum() == 0  # moved away
        assert out.max() > 200  # still somewhere in the image

    def test_deterministic_under_seed(self):
        ra = RandAugment.from_config("rand-m9-mstd0.5-inc1")
        img = _img(3)
        a = np.asarray(ra(img, np.random.default_rng(42)))
        b = np.asarray(ra(img, np.random.default_rng(42)))
        np.testing.assert_array_equal(a, b)

    def test_policy_changes_images(self):
        ra = RandAugment.from_config("rand-m9-mstd0.5-inc1")
        img = _img(4, size=64)
        rng = np.random.default_rng(0)
        changed = sum(
            not np.array_equal(np.asarray(ra(img, rng)), np.asarray(img))
            for _ in range(20))
        assert changed >= 10  # each of 2 layers applies w.p. 0.5

    def test_dispatch_aa_wins_over_jitter(self):
        fn = build_train_augment("rand-m9-mstd0.5-inc1", 0.4)
        assert fn is not None
        fn_cj = build_train_augment(None, 0.4)
        assert fn_cj is not None
        assert build_train_augment(None, 0.0) is None

    def test_color_jitter_bounded(self):
        out = color_jitter(_img(5), np.random.default_rng(0), 0.4)
        assert np.asarray(out).shape == (32, 32, 3)


class TestRandomErasing:
    def test_prob_zero_identity(self):
        x = jnp.ones((4, 16, 16, 3))
        out = apply_random_erasing(jax.random.PRNGKey(0), x,
                                   ErasingConfig(prob=0.0))
        np.testing.assert_array_equal(out, x)

    def test_always_erases_at_prob_one(self):
        x = jnp.zeros((8, 32, 32, 3))
        cfg = ErasingConfig(prob=1.0, mode="pixel")
        out = apply_random_erasing(jax.random.PRNGKey(1), x, cfg)
        per_img = (np.asarray(out) != 0).any(axis=(1, 2, 3))
        assert per_img.all()

    def test_erased_fraction_in_range(self):
        x = jnp.zeros((16, 32, 32, 3))
        cfg = ErasingConfig(prob=1.0, mode="pixel")
        out = np.asarray(apply_random_erasing(jax.random.PRNGKey(2), x, cfg))
        frac = (out != 0).any(-1).mean(axis=(1, 2))
        # area in [0.02, 1/3] up to rounding/clamping
        assert (frac >= 0.01).all() and (frac <= 0.40).all()

    def test_const_mode_keeps_zero_fill(self):
        x = jnp.ones((4, 16, 16, 3))
        cfg = ErasingConfig(prob=1.0, mode="const")
        out = np.asarray(apply_random_erasing(jax.random.PRNGKey(3), x, cfg))
        assert ((out == 0) | (out == 1)).all() and (out == 0).any()

    def test_rects_differ_across_batch(self):
        x = jnp.zeros((8, 32, 32, 3))
        cfg = ErasingConfig(prob=1.0)
        out = np.asarray(apply_random_erasing(jax.random.PRNGKey(4), x, cfg))
        masks = (out != 0).any(-1)
        assert len({m.tobytes() for m in masks}) > 1


class TestCIFAR:
    @pytest.fixture
    def cifar10_root(self, tmp_path):
        rng = np.random.default_rng(0)
        base = tmp_path / "cifar-10-batches-py"
        base.mkdir()
        for i in range(1, 6):
            with open(base / f"data_batch_{i}", "wb") as f:
                pickle.dump({b"data": rng.integers(
                    0, 256, (20, 3072), dtype=np.uint8),
                    b"labels": list(rng.integers(0, 10, 20))}, f)
        with open(base / "test_batch", "wb") as f:
            pickle.dump({b"data": rng.integers(
                0, 256, (10, 3072), dtype=np.uint8),
                b"labels": list(rng.integers(0, 10, 10))}, f)
        return str(tmp_path)

    def test_cifar10_shapes_and_norm(self, cifar10_root):
        from efficient_attention_tpu.data.cifar import CIFARDataset

        ds = CIFARDataset(cifar10_root, num_classes=10, train=True)
        assert len(ds) == 100
        img, label = ds.load(0, np.random.default_rng(0))
        assert img.shape == (32, 32, 3) and img.dtype == np.float32
        assert 0 <= label < 10
        assert abs(float(img.mean())) < 3.0  # normalized domain

        ds_eval = CIFARDataset(cifar10_root, num_classes=10, train=False)
        assert len(ds_eval) == 10

    def test_cifar_with_augment(self, cifar10_root):
        from efficient_attention_tpu.data.cifar import CIFARDataset
        from efficient_attention_tpu.data.randaugment import (
            build_train_augment,
        )

        ds = CIFARDataset(cifar10_root, num_classes=10, train=True,
                          augment=build_train_augment(
                              "rand-m9-mstd0.5-inc1", 0.4))
        img, _ = ds.load(3, np.random.default_rng(1))
        assert img.shape == (32, 32, 3) and np.isfinite(img).all()

    def test_cifar100_label_key(self, tmp_path):
        from efficient_attention_tpu.data.cifar import CIFARDataset

        rng = np.random.default_rng(0)
        base = tmp_path / "cifar-100-python"
        base.mkdir()
        for split in ("train", "test"):
            with open(base / split, "wb") as f:
                pickle.dump({b"data": rng.integers(
                    0, 256, (15, 3072), dtype=np.uint8),
                    b"fine_labels": list(rng.integers(0, 100, 15))}, f)
        ds = CIFARDataset(str(tmp_path), num_classes=100, train=True)
        assert len(ds) == 15
        _, label = ds.load(0, np.random.default_rng(0))
        assert 0 <= label < 100


def test_train_step_with_erasing_runs():
    """Integration: the jitted ViT train step applies device-side erasing."""
    from efficient_attention_tpu.data.mixup import MixupConfig
    from efficient_attention_tpu.models import create_model
    from efficient_attention_tpu.training import (
        TrainState,
        cosine_schedule,
        make_optimizer,
        make_vit_train_step,
    )

    model = create_model("evit_tiny_p16", attn_name="softmax", attn_args={},
                         img_size=32, num_classes=4, depth=1)
    x = jnp.ones((4, 32, 32, 3))
    y = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x[:1], deterministic=True)
    tx = make_optimizer("adamw", cosine_schedule(1e-3, 1, 10),
                        params_for_mask=params)
    state = TrainState.create(model.apply, params, tx)
    step = make_vit_train_step(
        MixupConfig(num_classes=4), num_classes=4,
        erasing_cfg=ErasingConfig(prob=1.0))
    new_state, metrics = jax.jit(step)(state, x, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))


class TestTrainInterpolation:
    """--train-interpolation reaches the host decode pipeline."""

    def _folder(self, tmp_path):
        from PIL import Image
        import numpy as np

        root = tmp_path / "train" / "cls0"
        root.mkdir(parents=True)
        arr = (np.random.default_rng(0).random((48, 48, 3)) * 255
               ).astype("uint8")
        Image.fromarray(arr).save(root / "a.jpg")
        return str(tmp_path / "train")

    def test_modes_decode_and_differ(self, tmp_path):
        import numpy as np

        from efficient_attention_tpu.data.imagenet import ImageFolderDataset

        root = self._folder(tmp_path)
        outs = {}
        for mode in ("bicubic", "bilinear", "nearest", "random"):
            ds = ImageFolderDataset(root, img_size=32, train=True,
                                    interpolation=mode)
            img, label = ds.load(0, np.random.default_rng(3))
            assert img.shape == (32, 32, 3) and label == 0
            outs[mode] = img
        # different kernels resample differently
        assert np.abs(outs["bicubic"] - outs["nearest"]).max() > 0


class TestMixupModes:
    """timm --mixup-mode batch/pair/elem and --cutmix-minmax."""

    def _run(self, cfg, seed=0, b=8):
        import jax
        import jax.numpy as jnp

        from efficient_attention_tpu.data.mixup import apply_mixup

        imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 16, 16, 3))
        labels = jnp.arange(b) % 4
        return apply_mixup(jax.random.PRNGKey(seed), imgs, labels, cfg)

    def test_elem_draws_per_sample_lambda(self):
        import jax.numpy as jnp

        from efficient_attention_tpu.data.mixup import MixupConfig

        cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=0.0,
                          switch_prob=0.0, prob=1.0, label_smoothing=0.0,
                          num_classes=4, mode="elem")
        _, soft = self._run(cfg)
        # per-sample lambdas: the max target prob differs across samples
        lams = jnp.max(soft, axis=-1)
        assert float(jnp.std(lams)) > 1e-3, lams

    def test_batch_shares_one_lambda(self):
        import jax.numpy as jnp

        from efficient_attention_tpu.data.mixup import MixupConfig

        cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=0.0,
                          switch_prob=0.0, prob=1.0, label_smoothing=0.0,
                          num_classes=4, mode="batch")
        _, soft = self._run(cfg)
        # pairing is i <-> B-1-i with a single lam: rows with distinct
        # labels have identical max-prob
        lams = jnp.sort(soft, axis=-1)[:, -1]
        assert float(jnp.std(lams)) < 1e-5

    def test_pair_mode_is_symmetric(self):
        import jax.numpy as jnp

        from efficient_attention_tpu.data.mixup import MixupConfig

        cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=0.0,
                          switch_prob=0.0, prob=1.0, label_smoothing=0.0,
                          num_classes=8, mode="pair")
        imgs, soft = self._run(cfg)
        # sample i mixed with B-1-i under the SAME lambda: their target
        # distributions are permutations of each other
        a = jnp.sort(soft, axis=-1)
        assert float(jnp.abs(a - a[::-1]).max()) < 1e-6

    def test_cutmix_minmax_box_within_range(self):
        import jax.numpy as jnp

        from efficient_attention_tpu.data.mixup import MixupConfig

        cfg = MixupConfig(mixup_alpha=0.0, cutmix_alpha=1.0,
                          switch_prob=1.0, prob=1.0, label_smoothing=0.0,
                          num_classes=4, mode="elem",
                          cutmix_minmax=(0.2, 0.5))
        _, soft = self._run(cfg)
        lams = jnp.max(soft, axis=-1)
        # box area between (0.2*16-1)^2-ish and (0.5*16)^2 (clipping can
        # shrink it): lam = 1 - area/HW stays in a sane band
        assert float(lams.min()) >= 1.0 - 0.5 * 0.5 - 0.05
        assert bool(jnp.isfinite(soft).all())
