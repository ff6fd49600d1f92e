"""Training substrate: schedules, optimizer masks, EMA, checkpoint averaging,
mixup, metrics, NaN detector."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.data.mixup import (
    MixupConfig,
    apply_mixup,
    one_hot_smooth,
    soft_target_cross_entropy,
)
from efficient_attention_tpu.training import (
    SmoothedValue,
    TrainState,
    average_checkpoints,
    cosine_schedule,
    cosine_tmult_schedule,
    inverse_sqrt_schedule,
    make_optimizer,
    weight_decay_mask,
)
from efficient_attention_tpu.utils.nan_detector import (
    NanDetector,
    first_nonfinite_leaf,
)


class TestSchedules:
    def test_cosine_endpoints(self):
        import math

        s = cosine_schedule(1e-3, warmup_steps=100, total_steps=1000,
                            warmup_init_lr=1e-6, min_lr=1e-5)
        assert abs(float(s(0)) - 1e-6) < 1e-7
        # timm warmup_prefix=False: the cosine resumes mid-curve after
        # warmup (progress counts from t=0 including the warmup region)
        expect = 1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + math.cos(math.pi * 0.1))
        assert abs(float(s(100)) - expect) < 1e-6
        assert abs(float(s(1000)) - 1e-5) < 1e-6

    def test_cosine_epoch_quantized(self):
        # DeiT steps the scheduler once per epoch (vit/main.py
        # lr_scheduler.step(epoch)): lr is constant within an epoch
        s = cosine_schedule(1e-3, warmup_steps=100, total_steps=1000,
                            warmup_init_lr=1e-6, min_lr=1e-5,
                            steps_per_epoch=50)
        assert float(s(250)) == float(s(299))
        assert float(s(250)) != float(s(300))

    def test_inverse_sqrt(self):
        s = inverse_sqrt_schedule(7e-4, warmup_steps=6000)
        assert abs(float(s(6000)) - 7e-4) < 1e-6
        np.testing.assert_allclose(float(s(24000)), 7e-4 / 2, rtol=1e-3)

    def test_cosine_tmult_restart(self):
        s = cosine_tmult_schedule(1.0, warmup_steps=0, period=100, t_mult=2.0,
                                  min_lr=0.0, max_steps=1000)
        # restart boundary at step 100: lr jumps back to ~max
        assert float(s(99)) < 0.01
        assert float(s(101)) > 0.9

    def test_cosine_tmult_lr_shrink(self):
        # fairseq cosine shrinks BOTH max and min lr by lr_shrink**i in
        # period i (cosine_lr_scheduler.py:137-140); recipe --lr-shrink 0.75
        s = cosine_tmult_schedule(1.0, warmup_steps=0, period=100,
                                  t_mult=2.0, min_lr=1e-3, lr_shrink=0.75,
                                  max_steps=1000)
        assert abs(float(s(0)) - 1.0) < 1e-6
        # start of period 1 (steps 100..299): max lr = 0.75
        np.testing.assert_allclose(float(s(100)), 0.75, rtol=1e-5)
        # end of period 0 approaches min_lr * 1
        np.testing.assert_allclose(float(s(99)), 1e-3, atol=5e-4)
        # start of period 2 (step 300): 0.75**2
        np.testing.assert_allclose(float(s(300)), 0.75 ** 2, rtol=1e-5)

    def test_fairseq_nag_matches_reference_recurrence(self):
        # transliterated fairseq/optim/nag.py:92-104 recurrence in numpy,
        # exercised under a CHANGING lr + weight decay (where optax's
        # nesterov SGD diverges)
        import optax

        from efficient_attention_tpu.training.optim import _fairseq_nag

        lrs = [0.5, 0.4, 0.3, 0.25]
        mom, wd = 0.9, 0.01
        p = np.array([1.0, -2.0], np.float32)
        grads = [np.array([0.1 * (i + 1), -0.05], np.float32)
                 for i in range(4)]
        # reference recurrence
        p_ref, buf, lr_old = p.copy(), np.zeros_like(p), None
        for lr, g in zip(lrs, grads):
            corr = 1.0 if lr_old is None else lr / lr_old
            p_ref *= 1 - lr * wd
            p_ref += mom * mom * corr * buf
            p_ref -= (1 + mom) * lr * g
            buf = mom * corr * buf - lr * g
            lr_old = lr
        # repo transformation
        sched = lambda c: jnp.asarray(lrs, jnp.float32)[c]  # noqa: E731
        tx = _fairseq_nag(sched, momentum=mom, weight_decay=wd)
        params = {"w": jnp.asarray(p)}
        state = tx.init(params)
        for g in grads:
            upd, state = tx.update({"w": jnp.asarray(g)}, state,
                                   params=params)
            params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(np.asarray(params["w"]), p_ref,
                                   rtol=1e-5, atol=1e-6)

    def test_fairseq_nag_constant_lr_equals_optax_nesterov(self):
        import optax

        from efficient_attention_tpu.training.optim import _fairseq_nag

        mom = 0.99
        tx_a = _fairseq_nag(lambda c: 0.1, momentum=mom)
        tx_b = optax.sgd(0.1, momentum=mom, nesterov=True)
        pa = {"w": jnp.asarray([1.0, 2.0])}
        pb = {"w": jnp.asarray([1.0, 2.0])}
        sa, sb = tx_a.init(pa), tx_b.init(pb)
        for i in range(5):
            g = {"w": jnp.asarray([0.1 * i - 0.2, 0.3])}
            ua, sa = tx_a.update(g, sa, params=pa)
            ub, sb = tx_b.update(g, sb, params=pb)
            pa = optax.apply_updates(pa, ua)
            pb = optax.apply_updates(pb, ub)
        np.testing.assert_allclose(np.asarray(pa["w"]), np.asarray(pb["w"]),
                                   rtol=1e-5, atol=1e-7)

    def test_weight_decay_mask(self):
        params = {"params": {
            "dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(4)},
            "ln": {"scale": jnp.zeros(4), "bias": jnp.zeros(4)},
            "pos_embed": jnp.zeros((1, 4, 4)),
        }}
        mask = weight_decay_mask(params)
        assert mask["params"]["dense"]["kernel"] is True
        assert mask["params"]["dense"]["bias"] is False
        assert mask["params"]["ln"]["scale"] is False
        assert mask["params"]["pos_embed"] is False


class TestTrainState:
    def test_ema_update(self):
        params = {"w": jnp.ones((2,))}
        tx = make_optimizer("sgd", lambda s: 0.1, weight_decay=0.0)
        state = TrainState.create(None, params, tx, ema_decay=0.5)
        grads = {"w": jnp.ones((2,))}
        state = state.apply_gradients(grads)
        # params moved, ema halfway between old ema (1.0) and new params
        new_w = float(state.params["w"][0])
        assert new_w < 1.0
        np.testing.assert_allclose(
            state.ema_params["w"], 0.5 * 1.0 + 0.5 * new_w, rtol=1e-6)

    def test_average_checkpoints(self):
        s1 = {"w": np.ones((2, 2), np.float32)}
        s2 = {"w": 3 * np.ones((2, 2), np.float32)}
        avg = average_checkpoints([s1, s2])
        np.testing.assert_allclose(avg["w"], 2.0)
        assert avg["w"].dtype == np.float32


class TestMixup:
    def test_soft_targets_sum_to_one(self, rng):
        cfg = MixupConfig(num_classes=10)
        imgs = jax.random.normal(rng, (8, 16, 16, 3))
        labels = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 10)
        out_imgs, targets = apply_mixup(jax.random.PRNGKey(2), imgs, labels, cfg)
        assert out_imgs.shape == imgs.shape
        np.testing.assert_allclose(targets.sum(-1), 1.0, rtol=1e-5)

    def test_label_smoothing_values(self):
        t = one_hot_smooth(jnp.array([2]), 10, 0.1)
        np.testing.assert_allclose(float(t[0, 2]), 0.91, rtol=1e-6)
        np.testing.assert_allclose(float(t[0, 0]), 0.01, rtol=1e-6)

    def test_soft_ce_matches_hard_ce(self, rng):
        logits = jax.random.normal(rng, (4, 10))
        labels = jnp.array([1, 2, 3, 4])
        hard = one_hot_smooth(labels, 10, 0.0)
        import optax

        np.testing.assert_allclose(
            soft_target_cross_entropy(logits, hard),
            jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)),
            rtol=1e-5)


class TestMeters:
    def test_smoothed_value(self):
        m = SmoothedValue(window_size=3)
        for v in (1, 2, 3, 4):
            m.update(v)
        assert m.avg == 3.0  # window of last 3
        assert m.global_avg == 2.5
        assert m.max == 4


class TestNanDetector:
    def test_first_nonfinite_leaf(self):
        tree = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, jnp.nan])}}
        path = first_nonfinite_leaf(tree)
        assert path is not None and "c" in path
        assert first_nonfinite_leaf({"a": jnp.ones(2)}) is None

    def test_module_interception(self):
        from flax import linen as nn

        class Bad(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(4, name="ok_layer")(x)
                return jnp.log(-jnp.abs(x) - 1.0)  # always nan

        m = Bad()
        x = jnp.ones((2, 4))
        params = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
        params = m.init(jax.random.PRNGKey(0), x)
        det = NanDetector()
        with det.intercept():
            m.apply(params, x)
        assert det.first_bad is not None


class TestImagenetPipeline:
    def test_prefetch_loader_order_and_shapes(self):
        from efficient_attention_tpu.data.imagenet import (
            PrefetchLoader,
            SyntheticImageDataset,
            ra_sampler_indices,
        )

        ds = SyntheticImageDataset(num_samples=64, img_size=8, num_classes=4)
        loader = PrefetchLoader(ds, batch_size=16, indices=np.arange(64),
                                num_threads=4)
        batches = list(loader)
        assert len(batches) == 4
        assert batches[0][0].shape == (16, 8, 8, 3)
        # deterministic labels let us verify ordering
        np.testing.assert_array_equal(
            batches[0][1], np.arange(16) % 4)

    def test_prefetch_loader_process_backend(self):
        from efficient_attention_tpu.data.imagenet import (
            PrefetchLoader,
            SyntheticImageDataset,
        )

        ds = SyntheticImageDataset(num_samples=32, img_size=8, num_classes=4)
        loader = PrefetchLoader(ds, batch_size=8, indices=np.arange(32),
                                num_threads=2, backend="process")
        batches = list(loader)
        assert len(batches) == 4
        assert batches[0][0].shape == (8, 8, 8, 3)
        np.testing.assert_array_equal(batches[0][1], np.arange(8) % 4)

    def test_prefetch_loader_window_is_bounded(self):
        """No worker may run further than prefetch+workers batches ahead of
        the consumer (the round-3 unbounded reorder buffer)."""
        import threading as _th
        import time

        from efficient_attention_tpu.data.imagenet import PrefetchLoader

        produced = []
        lock = _th.Lock()

        class SlowDataset:
            img_size = 4

            def __len__(self):
                return 64

            def load(self, idx, rng):
                with lock:
                    produced.append(idx)
                return np.zeros((4, 4, 3), np.float32), 0

        loader = PrefetchLoader(SlowDataset(), batch_size=1,
                                indices=np.arange(64), num_threads=2,
                                prefetch=2)
        it = iter(loader)
        next(it)
        time.sleep(0.3)  # let workers run as far ahead as they can
        # consumed 1; window = prefetch + workers = 4 -> at most
        # 1 + 4 + (workers already past the gate) batches produced
        assert len(produced) <= 1 + 4 + 2, produced

    def test_cached_uint8_dataset_roundtrip(self, tmp_path):
        from PIL import Image

        from efficient_attention_tpu.data.imagenet import (
            CachedUint8Dataset,
            ImageFolderDataset,
        )

        root = tmp_path / "imgs"
        rng = np.random.default_rng(0)
        for c in range(2):
            d = root / f"class_{c}"
            d.mkdir(parents=True)
            for i in range(3):
                arr = rng.integers(0, 255, (48, 64, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg", quality=90)
        cache = str(tmp_path / "cache")
        CachedUint8Dataset.build(str(root), cache, cache_side=32)
        ds = CachedUint8Dataset(cache, img_size=16, train=True)
        assert len(ds) == 6
        img, label = ds.load(0, np.random.default_rng(1))
        assert img.shape == (16, 16, 3) and img.dtype == np.float32
        assert label in (0, 1)
        # eval path + label agreement with the folder dataset
        folder = ImageFolderDataset(str(root), img_size=16, train=False)
        ds_eval = CachedUint8Dataset(cache, img_size=16, train=False)
        for i in range(6):
            _, l1 = folder.load(i, np.random.default_rng(0))
            _, l2 = ds_eval.load(i, np.random.default_rng(0))
            assert l1 == l2

    def test_ra_sampler(self):
        from efficient_attention_tpu.data.imagenet import ra_sampler_indices

        idx = ra_sampler_indices(512, epoch=0, num_replicas=2, rank=0)
        idx2 = ra_sampler_indices(512, epoch=0, num_replicas=2, rank=1)
        assert len(idx) == len(idx2) == 512 * 2 // 2 // 2  # floor(512/256)*256/2
        # repetitions: some indices appear multiple times across both shards
        combined = np.concatenate([idx, idx2])
        _, counts = np.unique(combined, return_counts=True)
        assert counts.max() >= 2


class TestMoreSchedules:
    def test_tri_stage(self):
        from efficient_attention_tpu.training.optim import tri_stage_schedule

        s = tri_stage_schedule(1.0, warmup_steps=10, hold_steps=10,
                               decay_steps=10, init_lr_scale=0.1,
                               final_lr_scale=0.01)
        assert abs(float(s(0)) - 0.1) < 1e-6
        assert abs(float(s(10)) - 1.0) < 1e-6
        assert abs(float(s(15)) - 1.0) < 1e-6  # hold
        assert abs(float(s(30)) - 0.01) < 1e-3  # decayed to final

    def test_plateau(self):
        from efficient_attention_tpu.training.optim import ReduceLROnPlateau

        p = ReduceLROnPlateau(factor=0.5, patience=1)
        assert p.step(1.0) == 1.0
        assert p.step(0.5) == 1.0  # improved
        p.step(0.6)
        assert p.step(0.6) == 0.5  # two bad epochs -> halve


class TestSampling:
    def test_sample_decode_respects_eos(self):
        import jax
        from efficient_attention_tpu.generation.beam_search import sample_decode

        Vt = 10

        def step_fn(cache, tokens, step):
            logits = jnp.full((tokens.shape[0], Vt), -20.0)
            logits = logits.at[:, 5].set(10.0)
            logits = jnp.where(step >= 2, logits.at[:, 2].set(30.0), logits)
            return logits, cache

        out = sample_decode(step_fn, lambda b, l: (), batch=3, max_len=8,
                            bos=2, eos=2, rng=jax.random.PRNGKey(0),
                            top_k=2)
        out = np.asarray(out)
        np.testing.assert_array_equal(out[:, :3], [[5, 5, 2]] * 3)
        # after eos everything is pad
        assert (out[:, 3:] == 1).all()


class TestTensorBoardWriter:
    def test_event_file_structure(self, tmp_path):
        """Records are valid TFRecords (length + masked CRC32C verified by
        re-parsing) containing our scalar tags."""
        import struct
        from efficient_attention_tpu.training.tensorboard import (
            SummaryWriter,
            _masked_crc,
        )

        w = SummaryWriter(str(tmp_path))
        w.add_scalar("train/loss", 1.5, step=3)
        w.add_scalars({"acc1": 0.7, "acc5": 0.9}, step=4, prefix="val/")
        w.close()
        files = list(tmp_path.iterdir())
        assert len(files) == 1 and files[0].name.startswith("events.out.tfevents")
        data = files[0].read_bytes()
        # walk the TFRecord stream verifying CRCs
        off, records = 0, []
        while off < len(data):
            (length,) = struct.unpack("<Q", data[off:off + 8])
            (hcrc,) = struct.unpack("<I", data[off + 8:off + 12])
            assert hcrc == _masked_crc(data[off:off + 8])
            payload = data[off + 12:off + 12 + length]
            (pcrc,) = struct.unpack(
                "<I", data[off + 12 + length:off + 16 + length])
            assert pcrc == _masked_crc(payload)
            records.append(payload)
            off += 16 + length
        assert len(records) == 4  # file_version + 3 scalars
        assert b"brain.Event" in records[0]
        assert b"train/loss" in records[1]
        assert b"val/acc1" in records[2]


class TestOfflineSinks:
    def test_wandb_offline_fallback(self, tmp_path):
        import json

        from efficient_attention_tpu.training.wandb_sink import WandBLogger

        wb = WandBLogger("proj", run_name="r", config={"lr": 1e-3},
                         log_dir=str(tmp_path))
        wb.log({"loss": 1.5}, step=3)
        wb.finish()
        lines = [json.loads(ln) for ln in
                 (tmp_path / "wandb_offline" / "run.jsonl").read_text()
                 .splitlines()]
        assert lines[0]["_type"] == "run_start"
        assert lines[1] == {"step": 3, "loss": 1.5}

    def test_azureml_offline_fallback(self, tmp_path):
        import json

        from efficient_attention_tpu.training.azureml_sink import AzureMLLogger

        aml = AzureMLLogger(True, log_dir=str(tmp_path))
        aml.log({"loss": 2.0, "gnorm": 0.5}, step=7)
        aml.finish()
        lines = [json.loads(ln) for ln in
                 (tmp_path / "azureml_offline" / "metrics.jsonl").read_text()
                 .splitlines()]
        assert lines[0]["_type"] == "run_start"
        assert lines[1] == {"step": 7, "loss": 2.0, "gnorm": 0.5}

    def test_disabled_sinks_are_noops(self, tmp_path):
        from efficient_attention_tpu.training.azureml_sink import AzureMLLogger
        from efficient_attention_tpu.training.wandb_sink import WandBLogger

        WandBLogger(None, log_dir=str(tmp_path)).log({"x": 1.0}, step=0)
        AzureMLLogger(False, log_dir=str(tmp_path)).log({"x": 1.0}, step=0)
        assert list(tmp_path.iterdir()) == []


class TestStepSkipRecovery:
    """Non-finite-step skip recovery — the bf16 analogue of the reference's
    gradient-overflow handling (``fairseq/trainer.py:911-920``): a poisoned
    batch's update is dropped (step/opt-state/params untouched) and training
    continues bit-identically to a run that never saw the batch."""

    def test_poisoned_batch_skipped_and_training_continues(self):
        import optax

        from efficient_attention_tpu.training.lm_steps import (
            make_lm_train_step,
        )

        # tiny "model" whose logits blow up to inf iff the batch contains
        # token 3 — a batch-triggered divergence, as in the reference's
        # overflow scenario
        def apply_fn(params, tokens, deterministic=True, rngs=None):
            denom = 1.0 - (tokens == 3).any().astype(jnp.float32)
            emb = jax.nn.one_hot(tokens, 8) @ params["params"]["w"]
            return emb / denom

        params = {"params": {"w": jnp.eye(8) * 0.1}}
        state0 = TrainState.create(apply_fn, params, optax.sgd(0.1))
        step = jax.jit(make_lm_train_step(pad_idx=-1, skip_nonfinite=True))
        clean1 = jnp.ones((2, 4), jnp.int32)
        clean2 = jnp.full((2, 4), 2, jnp.int32)
        poisoned = jnp.full((2, 4), 3, jnp.int32)

        rng = jax.random.PRNGKey(0)
        tgt = jnp.zeros((2, 4), jnp.int32)

        # run A: clean1, poisoned, clean2
        sA, m1 = step(state0, clean1, tgt, rng)
        assert not bool(m1.skipped)
        sA_after_poison, mp = step(sA, poisoned, tgt, rng)
        assert bool(mp.skipped)
        # state untouched bitwise (step NOT incremented)
        for a, b in zip(jax.tree_util.tree_leaves(sA_after_poison),
                        jax.tree_util.tree_leaves(sA)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        sA_final, m2 = step(sA_after_poison, clean2, tgt, rng)
        assert not bool(m2.skipped)

        # run B: clean1, clean2 (no poison)
        sB, _ = step(state0, clean1, tgt, rng)
        sB_final, _ = step(sB, clean2, tgt, rng)
        for a, b in zip(jax.tree_util.tree_leaves(sA_final),
                        jax.tree_util.tree_leaves(sB_final)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_disabled_skip_applies_nan(self):
        import optax

        from efficient_attention_tpu.training.lm_steps import (
            make_lm_train_step,
        )

        def apply_fn(params, tokens, deterministic=True, rngs=None):
            return (jax.nn.one_hot(tokens, 8) @ params["params"]["w"]
                    ) / 0.0  # always inf

        params = {"params": {"w": jnp.eye(8) * 0.1}}
        state0 = TrainState.create(apply_fn, params, optax.sgd(0.1))
        step = jax.jit(make_lm_train_step(pad_idx=-1, skip_nonfinite=False))
        s, m = step(state0, jnp.ones((2, 4), jnp.int32),
                    jnp.zeros((2, 4), jnp.int32), jax.random.PRNGKey(0))
        assert m.skipped is None
        assert int(s.step) == 1  # update applied (and poisons params)
        assert not bool(jnp.isfinite(s.params["params"]["w"]).all())


class TestMixedPrecision:
    """--bf16: f32 master params, bf16 compute (cast_params)."""

    def _setup(self):
        from efficient_attention_tpu.models.transformer import TransformerLM
        from efficient_attention_tpu.training import TrainState, make_optimizer

        lm = TransformerLM(vocab_size=50, embed_dim=32, ffn_dim=64,
                           num_layers=1, num_heads=2, max_len=64,
                           dropout=0.0)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 2, 50)
        params = lm.init(jax.random.PRNGKey(1), tokens)
        tx = make_optimizer("adamw", lambda s: 1e-3, weight_decay=0.0)
        state = TrainState.create(lm.apply, params, tx)
        return lm, state, tokens

    def test_cast_params_masters_stay_f32(self):
        from efficient_attention_tpu.training.lm_steps import (
            cast_params,
            make_lm_train_step,
        )

        lm, state, tokens = self._setup()
        targets = jnp.roll(tokens, -1, 1)
        cast = cast_params(state.params, jnp.bfloat16)
        assert all(x.dtype == jnp.bfloat16
                   for x in jax.tree_util.tree_leaves(cast)
                   if hasattr(x, "dtype") and jnp.issubdtype(
                       x.dtype, jnp.floating))

        step = make_lm_train_step(compute_dtype=jnp.bfloat16)
        new_state, metrics = step(state, tokens, targets,
                                  jax.random.PRNGKey(2))
        # master params and optimizer state remain f32 after the update
        assert all(x.dtype == jnp.float32
                   for x in jax.tree_util.tree_leaves(new_state.params)
                   if hasattr(x, "dtype") and jnp.issubdtype(
                       x.dtype, jnp.floating))
        assert math.isfinite(float(metrics.loss))

    def test_bf16_loss_tracks_f32(self):
        from efficient_attention_tpu.training.lm_steps import (
            make_lm_train_step,
        )

        lm, state, tokens = self._setup()
        targets = jnp.roll(tokens, -1, 1)
        _, m32 = make_lm_train_step()(state, tokens, targets,
                                      jax.random.PRNGKey(2))
        _, m16 = make_lm_train_step(compute_dtype=jnp.bfloat16)(
            state, tokens, targets, jax.random.PRNGKey(2))
        assert abs(float(m32.loss) - float(m16.loss)) < 0.05, (
            float(m32.loss), float(m16.loss))
