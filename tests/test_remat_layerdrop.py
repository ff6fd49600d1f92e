"""--checkpoint-activations (nn.remat) and LayerDrop.

The remat contract is exact: rematerializing a layer in the backward
changes WHERE activations come from, not the math — gradients must match
the un-rematted model to float tolerance (reference
``transformer_config.py:165``, ``modules/checkpoint_activations.py``).

LayerDrop (fairseq ``LayerDropModuleList``, ``transformer_encoder.py:91``):
training skips whole layers with probability p (identity); eval runs all
layers.  p=1 must make every layer a no-op (zero grads to layer params);
p=0 must be bit-identical to the baseline.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_attention_tpu.models.efficient_vit import EfficientTransformer
from efficient_attention_tpu.models.transformer import (
    TransformerLM,
    TransformerModel,
)


def _lm(**kw):
    kw.setdefault("dropout", 0.0)
    kw.setdefault("num_layers", 2)
    return TransformerLM(vocab_size=50, embed_dim=32, ffn_dim=64,
                         num_heads=2, max_len=64, **kw)


def _tokens(key, vocab=50, b=2, t=16):
    return jax.random.randint(key, (b, t), 2, vocab)


def _lm_grads(model, params, tokens, targets):
    def loss_fn(p):
        return model.apply(
            p, tokens, targets, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7)},
            method=model.loss).mean()

    return jax.grad(loss_fn)(params)


class TestRemat:
    def test_lm_grads_match(self):
        base, remat = _lm(), _lm(checkpoint_activations=True)
        key = jax.random.PRNGKey(0)
        tokens = _tokens(key)
        targets = jnp.roll(tokens, -1, axis=1)
        params = base.init(jax.random.PRNGKey(1), tokens)
        g0 = _lm_grads(base, params, tokens, targets)
        g1 = _lm_grads(remat, params, tokens, targets)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), g0, g1)

    def test_mt_grads_match(self):
        kw = dict(src_vocab_size=40, tgt_vocab_size=44, embed_dim=32,
                  ffn_dim=64, num_layers=2, num_heads=2, max_len=64,
                  dropout=0.0)
        base = TransformerModel(**kw)
        remat = TransformerModel(checkpoint_activations=True, **kw)
        key = jax.random.PRNGKey(0)
        src = _tokens(key, vocab=40)
        prev = _tokens(jax.random.PRNGKey(2), vocab=44)
        params = base.init(jax.random.PRNGKey(1), src, prev)

        def grads(model):
            def loss_fn(p):
                logits = model.apply(
                    p, src, prev, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(7)})
                return jnp.square(logits).mean()

            return jax.grad(loss_fn)(params)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            grads(base), grads(remat))

    def test_vit_grads_match(self):
        kw = dict(img_size=32, patch_size=8, embed_dim=32, depth=2,
                  num_heads=2, num_classes=10, attn_name="softmax")
        base = EfficientTransformer(**kw)
        remat = EfficientTransformer(checkpoint_activations=True, **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        params = base.init(jax.random.PRNGKey(1), x)

        def grads(model):
            def loss_fn(p):
                out = model.apply(p, x, deterministic=False,
                                  rngs={"dropout": jax.random.PRNGKey(7)})
                return jnp.square(out).mean()

            return jax.grad(loss_fn)(params)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            grads(base), grads(remat))

    def test_eval_path_unchanged(self):
        base, remat = _lm(), _lm(checkpoint_activations=True)
        tokens = _tokens(jax.random.PRNGKey(0))
        params = base.init(jax.random.PRNGKey(1), tokens)
        np.testing.assert_array_equal(
            base.apply(params, tokens), remat.apply(params, tokens))


class TestLayerDrop:
    def test_eval_ignores_layerdrop(self):
        base, ld = _lm(), _lm(layerdrop=0.5)
        tokens = _tokens(jax.random.PRNGKey(0))
        params = base.init(jax.random.PRNGKey(1), tokens)
        np.testing.assert_array_equal(
            base.apply(params, tokens), ld.apply(params, tokens))

    def test_p0_matches_baseline_in_training(self):
        base, ld = _lm(), _lm(layerdrop=0.0)
        tokens = _tokens(jax.random.PRNGKey(0))
        targets = jnp.roll(tokens, -1, axis=1)
        params = base.init(jax.random.PRNGKey(1), tokens)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            _lm_grads(base, params, tokens, targets),
            _lm_grads(ld, params, tokens, targets))

    def test_p1_zeroes_layer_grads(self):
        ld = _lm(layerdrop=1.0)
        tokens = _tokens(jax.random.PRNGKey(0))
        targets = jnp.roll(tokens, -1, axis=1)
        params = ld.init(jax.random.PRNGKey(1), tokens)
        g = _lm_grads(ld, params, tokens, targets)
        layer_g = g["params"]["decoder"]["layer_0"]
        total = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(layer_g))
        assert total == 0.0
        # the embedding still learns (the residual stream bypasses layers)
        emb = g["params"]["decoder"]["embed_tokens"]
        assert sum(float(jnp.abs(x).sum())
                   for x in jax.tree_util.tree_leaves(emb)) > 0.0

    def test_intermediate_p_drops_some_forward(self):
        # with 8 layers at p=0.5 the training forward must differ from the
        # eval forward (some layer got dropped) for at least one seed
        ld = _lm(layerdrop=0.5, num_layers=4)
        tokens = _tokens(jax.random.PRNGKey(0))
        params = ld.init(jax.random.PRNGKey(1), tokens)
        ref = ld.apply(params, tokens)
        diffs = []
        for seed in range(4):
            out = ld.apply(params, tokens, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(seed)})
            diffs.append(float(jnp.abs(out - ref).max()))
        assert max(diffs) > 0.0

    def test_prune_layer_params(self):
        from efficient_attention_tpu.training.checkpoint import (
            parse_layers_to_keep,
            prune_layer_params,
        )

        assert parse_layers_to_keep(None) is None
        assert parse_layers_to_keep("") is None
        assert parse_layers_to_keep("0, 2,4") == [0, 2, 4]

        full = _lm(num_layers=4)
        tokens = _tokens(jax.random.PRNGKey(0))
        params = full.init(jax.random.PRNGKey(1), tokens)

        # identity prune: keeping every layer must be a no-op
        same = prune_layer_params(params, [0, 1, 2, 3], "decoder")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), params, same)
        np.testing.assert_array_equal(
            full.apply(params, tokens), full.apply(same, tokens))

        # keep [0, 2]: renumbered, loadable by a 2-layer model
        pruned = prune_layer_params(params, [0, 2], "decoder")
        dec_full = params["params"]["decoder"]
        dec_pruned = pruned["params"]["decoder"]
        assert sorted(k for k in dec_pruned if k.startswith("layer_")) == \
            ["layer_0", "layer_1"]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            dec_full["layer_2"], dec_pruned["layer_1"])
        shallow = _lm(num_layers=2)
        out = shallow.apply(pruned, tokens)
        assert bool(jnp.isfinite(out).all())

        with pytest.raises(ValueError):
            prune_layer_params(params, [0, 9], "decoder")
        with pytest.raises(KeyError):
            prune_layer_params(params, [0], "encoder")

    def test_remat_composes_with_layerdrop(self):
        ld = _lm(layerdrop=0.3, checkpoint_activations=True)
        base = _lm(layerdrop=0.3)
        tokens = _tokens(jax.random.PRNGKey(0))
        targets = jnp.roll(tokens, -1, axis=1)
        params = base.init(jax.random.PRNGKey(1), tokens)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            _lm_grads(base, params, tokens, targets),
            _lm_grads(ld, params, tokens, targets))
