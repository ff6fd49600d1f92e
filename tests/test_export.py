"""AOT export roundtrip (the reference's ``tests/test_export.py`` class of
coverage, in jax.export/StableHLO form)."""
import jax
import jax.numpy as jnp
import numpy as np

from efficient_attention_tpu.models.transformer import TransformerLM
from efficient_attention_tpu.utils.export import export_apply, load_exported


def test_lm_export_roundtrip(tmp_path):
    lm = TransformerLM(vocab_size=50, embed_dim=32, ffn_dim=64,
                       num_layers=2, num_heads=2, max_len=64, dropout=0.0)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 2, 50)
    params = lm.init(jax.random.PRNGKey(1), tokens)

    blob = export_apply(lm.apply, params, tokens)
    assert isinstance(blob, bytes) and len(blob) > 1000

    # artifact survives a disk roundtrip and needs no model code to run
    f = tmp_path / "lm.stablehlo"
    f.write_bytes(blob)
    fn = load_exported(f.read_bytes())
    out = fn(tokens)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(lm.apply(params, tokens)),
                               rtol=2e-5, atol=2e-5)


def test_export_with_eva_attention():
    from efficient_attention_tpu import AttentionFactory

    m = AttentionFactory.build_attention(
        "eva", {"dim": 48, "num_heads": 4, "num_landmarks": 8,
                "window_size": 4})
    x = jnp.ones((2, 32, 48))
    params = m.init(jax.random.PRNGKey(0), x)
    fn = load_exported(export_apply(m.apply, params, x))
    np.testing.assert_allclose(np.asarray(fn(x)),
                               np.asarray(m.apply(params, x)),
                               rtol=2e-5, atol=2e-5)
