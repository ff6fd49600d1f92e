"""YAML config composition (the hydra-path analogue, ``config_yaml.py``).

Mirrors what the reference's hydra stack provides on the recipes' behalf:
config-group composition via ``defaults:``, nested attention-arg groups,
and override precedence (CLI beats YAML beats parser defaults).
"""
import os

import pytest

from efficient_attention_tpu.config_yaml import load_yaml_config

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


class TestLoadCompose:
    def test_defaults_compose_in_order(self, tmp_path):
        (tmp_path / "base.yaml").write_text("a: 1\nb: 2\nnested:\n  x: 1\n")
        (tmp_path / "child.yaml").write_text(
            "defaults:\n  - base.yaml\nb: 3\nnested:\n  y: 2\n")
        cfg = load_yaml_config(str(tmp_path / "child.yaml"))
        assert cfg == {"a": 1, "b": 3, "nested": {"x": 1, "y": 2}}

    def test_circular_include_raises(self, tmp_path):
        (tmp_path / "a.yaml").write_text("defaults:\n  - b.yaml\n")
        (tmp_path / "b.yaml").write_text("defaults:\n  - a.yaml\n")
        with pytest.raises(ValueError, match="circular"):
            load_yaml_config(str(tmp_path / "a.yaml"))

    def test_shipped_recipes_load(self):
        for name in ("wikitext103_causal_eva.yaml", "wmt14_eva.yaml",
                     "imagenet_deit_eva.yaml"):
            cfg = load_yaml_config(os.path.join(CONFIGS, name))
            assert cfg, name
        cfg = load_yaml_config(
            os.path.join(CONFIGS, "wikitext103_causal_eva.yaml"))
        # composed from the base recipe
        assert cfg["optimizer"] == "nag"
        assert cfg["attn_args_decoder"]["window_size"] == 128


class TestCliIntegration:
    def test_lm_yaml_selects_attention_and_args(self, tmp_path):
        from efficient_attention_tpu.cli.train_lm import parse_args

        cfg = tmp_path / "lm.yaml"
        cfg.write_text(
            "attn_name_decoder: causal_eva\n"
            "lr: 0.5\n"
            "attn_args_decoder:\n"
            "  window_size: 64\n"
            "  chunk_size: 4\n")
        args = parse_args(["--config", str(cfg)])
        # YAML chose the attention class -> its flags were registered and
        # the nested values applied
        assert args.attn_name_decoder == "causal_eva"
        assert args.attn_args_decoder.window_size == 64
        assert args.attn_args_decoder.chunk_size == 4
        assert args.lr == 0.5

    def test_cli_overrides_yaml(self, tmp_path):
        from efficient_attention_tpu.cli.train_lm import parse_args

        cfg = tmp_path / "lm.yaml"
        cfg.write_text("lr: 0.5\nmax-update: 10\n")
        args = parse_args(["--config", str(cfg), "--lr", "2.0"])
        assert args.lr == 2.0          # explicit CLI wins
        assert args.max_update == 10   # YAML beats parser default

    def test_cli_overrides_nested_yaml(self, tmp_path):
        from efficient_attention_tpu.cli.train_lm import parse_args

        cfg = tmp_path / "lm.yaml"
        cfg.write_text(
            "attn_name_decoder: causal_eva\n"
            "attn_args_decoder:\n"
            "  window_size: 64\n")
        args = parse_args(["--config", str(cfg),
                           "--decoder-attn-window-size", "32"])
        assert args.attn_args_decoder.window_size == 32

    def test_vit_yaml_selects_model(self, tmp_path):
        from efficient_attention_tpu.cli.train_vit import parse_args

        cfg = tmp_path / "vit.yaml"
        cfg.write_text(
            "model: evit_tiny_p8\n"
            "attn_name: eva\n"
            "attn_specific_args:\n"
            "  num_landmarks: 49\n")
        args = parse_args(["--config", str(cfg)])
        assert args.model == "evit_tiny_p8"
        assert args.attn_name == "eva"
        assert args.attn_specific_args.num_landmarks == 49

    def test_mt_shipped_recipe_parses(self):
        from efficient_attention_tpu.cli.train_mt import parse_args

        args = parse_args(
            ["--config", os.path.join(CONFIGS, "wmt14_eva.yaml"),
             "--dummy-data"])
        assert args.attn_name_encoder == "eva"
        assert args.attn_args_encoder.num_landmarks == 8
        assert args.attn_args_decoder.window_size == 16
        assert args.lr == 7e-4


class TestReviewRegressions:
    """Regressions from the round-2 self-review of the config layer."""

    def test_diamond_include_is_not_circular(self, tmp_path):
        (tmp_path / "base.yaml").write_text("a: 1\n")
        (tmp_path / "g1.yaml").write_text("defaults:\n  - base.yaml\nb: 2\n")
        (tmp_path / "g2.yaml").write_text("defaults:\n  - base.yaml\nc: 3\n")
        (tmp_path / "top.yaml").write_text(
            "defaults:\n  - g1.yaml\n  - g2.yaml\n")
        cfg = load_yaml_config(str(tmp_path / "top.yaml"))
        assert cfg == {"a": 1, "b": 2, "c": 3}

    def test_equals_form_cli_beats_yaml(self, tmp_path):
        from efficient_attention_tpu.cli.train_lm import parse_args

        cfg = tmp_path / "lm.yaml"
        cfg.write_text("attn_name_decoder: causal_eva\nlr: 0.5\n")
        args = parse_args(["--config", str(cfg),
                           "--attn-name-decoder=softmax", "--lr=2.0"])
        assert args.attn_name_decoder == "softmax"
        assert args.lr == 2.0

    def test_abbreviated_flag_beats_yaml(self, tmp_path):
        from efficient_attention_tpu.cli.train_lm import parse_args

        cfg = tmp_path / "lm.yaml"
        cfg.write_text("max-update: 99\n")
        # argparse prefix abbreviation: --max-upd resolves to --max-update
        args = parse_args(["--config", str(cfg), "--max-upd", "500"])
        assert args.max_update == 500

    def test_unknown_yaml_key_raises(self, tmp_path):
        from efficient_attention_tpu.cli.train_lm import parse_args

        cfg = tmp_path / "lm.yaml"
        cfg.write_text("max_updates: 99\n")  # typo: no such option
        with pytest.raises(ValueError, match="unknown config key"):
            parse_args(["--config", str(cfg)])

    def test_yaml_value_choices_and_coercion(self, tmp_path):
        from efficient_attention_tpu.cli.train_lm import parse_args

        cfg = tmp_path / "lm.yaml"
        cfg.write_text("optimizer: nagg\n")  # not a valid choice
        with pytest.raises(ValueError, match="not in"):
            parse_args(["--config", str(cfg)])
        cfg.write_text("lr: '0.25'\n")  # string coerced through type=float
        args = parse_args(["--config", str(cfg)])
        assert args.lr == 0.25 and isinstance(args.lr, float)

    def test_shipped_vit_recipe_sets_clip_grad(self):
        from efficient_attention_tpu.cli.train_vit import parse_args

        args = parse_args(["--config",
                           os.path.join(CONFIGS, "imagenet_deit_eva.yaml"),
                           "--data-set", "SYNTHETIC"])
        assert args.clip_grad == 5.0  # the reference recipe's --clip-grad

    def test_cli_class_override_drops_stale_nested_group(self, tmp_path):
        # overriding the class on the CLI must not crash on the YAML's
        # nested args for the no-longer-selected class (hydra swaps the
        # whole group likewise)
        from efficient_attention_tpu.cli.train_lm import parse_args

        cfg = tmp_path / "lm.yaml"
        cfg.write_text(
            "attn_name_decoder: causal_eva\n"
            "attn_args_decoder:\n"
            "  window_size: 64\n")
        args = parse_args(["--config", str(cfg),
                           "--attn-name-decoder=softmax"])
        assert args.attn_name_decoder == "softmax"

    def test_dash_spelled_name_key_also_drops_stale_group(self, tmp_path):
        # flat keys may be dash-spelled; the sibling-class lookup must see
        # them too (regression: the lookup used the normalized dest against
        # raw YAML keys, so dash-spelled name keys skipped the drop guard)
        from efficient_attention_tpu.cli.train_lm import parse_args

        cfg = tmp_path / "lm.yaml"
        cfg.write_text(
            "attn-name-decoder: causal_eva\n"
            "attn_args_decoder:\n"
            "  window_size: 64\n")
        args = parse_args(["--config", str(cfg),
                           "--attn-name-decoder=softmax"])
        assert args.attn_name_decoder == "softmax"


class TestHydraTrain:
    """``cli/hydra_train.py`` — fairseq_cli/hydra_train.py surface."""

    def test_override_translation(self):
        from efficient_attention_tpu.cli.hydra_train import (
            _override_to_flags,
            parse_overrides,
        )

        assert _override_to_flags("lr", "1e-3") == ["--lr", "1e-3"]
        assert _override_to_flags("eval_bleu", "true") == ["--eval-bleu"]
        assert _override_to_flags(
            "attn_args_encoder.window_size", "8"
        ) == ["--encoder-attn-window-size", "8"]
        task, argv = parse_overrides(
            ["task=translation", "max_update=5", "update_freq=2"])
        assert task == "translation"
        assert argv == ["--max-update", "5", "--update-freq", "2"]
        import pytest as _pytest

        with _pytest.raises(ValueError):
            parse_overrides(["not-an-override"])
        with _pytest.raises(ValueError):
            _override_to_flags("eval_bleu", "false")

    def test_task_inference(self):
        from efficient_attention_tpu.cli.hydra_train import _infer_task

        assert _infer_task("wikitext103_causal_eva") == "language_modeling"
        assert _infer_task("wmt14_eva") == "translation"
        assert _infer_task("imagenet_deit_eva") == "image_classification"
        assert _infer_task("mystery") is None

    def test_end_to_end_runs_lm(self, tmp_path):
        """hydra_train routes a recipe + overrides into the LM trainer."""
        from efficient_attention_tpu.cli import hydra_train

        cfg = tmp_path / "tiny_lm.yaml"
        cfg.write_text(
            "task: language_modeling\n"
            "attn_name_decoder: softmax\n")
        stats = hydra_train.cli_main([
            "--config-dir", str(tmp_path), "--config-name", "tiny_lm",
            "dummy_data=true", "max_update=2", "max_tokens=256",
            "tokens_per_sample=16", "decoder_embed_dim=32",
            "decoder_ffn_embed_dim=32", "decoder_layers=1",
            "decoder_attention_heads=2",
            f"save_dir={tmp_path}/ckpt", "log_interval=1"])
        assert stats["step"] == 2
