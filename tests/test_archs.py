"""--arch named architecture presets (fairseq register_model_architecture)."""
import pytest

from efficient_attention_tpu.cli import train_lm, train_mt


class TestLMArchs:
    def test_gpt_preset(self):
        args = train_lm.parse_args(["--dummy-data", "--arch",
                                    "transformer_lm_gpt"])
        assert args.decoder_embed_dim == 768
        assert args.decoder_ffn_embed_dim == 3072
        assert args.decoder_layers == 12
        assert args.decoder_attention_heads == 12
        assert args.activation_fn == "gelu"
        # non-wiki103 archs reset the parser's wiki103 recipe defaults to
        # fairseq's base full-softmax CE
        assert args.criterion == "cross_entropy"
        assert not args.adaptive_input
        model = train_lm.build_model(args, vocab_size=50000)
        assert model.adaptive_cutoffs is None

    def test_wiki103_preset_turns_on_published_config(self):
        args = train_lm.parse_args(["--dummy-data", "--arch",
                                    "transformer_lm_wiki103"])
        assert args.adaptive_input and args.tie_adaptive_weights
        assert args.no_decoder_final_norm
        assert args.decoder_layers == 16 and args.decoder_embed_dim == 1024
        assert args.dropout == 0.3
        model = train_lm.build_model(args, vocab_size=70000)
        assert model.adaptive_input and model.tie_adaptive
        assert not model.final_norm
        assert model.adaptive_cutoffs == (20000, 60000)

    def test_explicit_flag_beats_preset(self):
        args = train_lm.parse_args([
            "--dummy-data", "--arch", "transformer_lm_gpt",
            "--decoder-layers", "3"])
        assert args.decoder_layers == 3
        assert args.decoder_embed_dim == 768  # rest of preset still applies

    def test_unknown_arch_raises(self):
        with pytest.raises(ValueError, match="unknown --arch"):
            train_lm.parse_args(["--dummy-data", "--arch", "nope"])


class TestMTArchs:
    def test_base_is_defaults(self):
        args = train_mt.parse_args(["--dummy-data"])
        assert args.encoder_embed_dim == 512
        assert args.encoder_ffn_embed_dim == 2048

    def test_iwslt(self):
        args = train_mt.parse_args(["--dummy-data", "--arch",
                                    "transformer_iwslt_de_en"])
        assert args.encoder_ffn_embed_dim == 1024
        assert args.encoder_attention_heads == 4

    def test_big_variants(self):
        de = train_mt.parse_args(["--dummy-data", "--arch",
                                  "transformer_vaswani_wmt_en_de_big"])
        fr = train_mt.parse_args(["--dummy-data", "--arch",
                                  "transformer_vaswani_wmt_en_fr_big"])
        assert de.encoder_embed_dim == fr.encoder_embed_dim == 1024
        assert de.dropout == 0.3 and fr.dropout == 0.1
