"""Hydra-style launcher — ``fairseq_cli/hydra_train.py`` equivalent.

The reference exposes a second train entry point driven by config
composition: ``fairseq-hydra-train --config-dir ... --config-name recipe
key=value ...`` (``fairseq_cli/hydra_train.py``, ``fairseq/config/``).
hydra/omegaconf are not in this image, so this CLI reproduces that surface
on top of the YAML composition layer (``config_yaml.py``, which already
implements hydra's ``defaults:`` group merging):

  * ``--config-dir`` / ``--config-name`` select a recipe YAML;
  * trailing ``key=value`` tokens are hydra-style overrides, translated to
    the underlying train CLI's flags (``lr=1e-3`` -> ``--lr 1e-3``;
    dotted attention keys ``attn_args_encoder.window_size=8`` ->
    ``--encoder-attn-window-size 8``);
  * the target trainer is the ``task:`` key in the YAML
    (``language_modeling`` / ``translation`` / ``image_classification``),
    a ``task=...`` override, or is inferred from the recipe name
    (wikitext* -> LM, wmt* -> MT, imagenet*/cifar* -> ViT).
"""
from __future__ import annotations

import argparse
import os
from typing import List, Optional, Tuple

_TASK_CLI = {
    "language_modeling": "train_lm",
    "translation": "train_mt",
    "image_classification": "train_vit",
}

# dotted-namespace prefixes -> CLI flag prefixes (the nested-argparse
# registration in each train CLI: options.py:148-150 semantics)
_NESTED_PREFIX = {
    "attn_args_encoder": "encoder-attn",
    "attn_args_decoder": "decoder-attn",
    "attn_args": "attn",
}


def _infer_task(config_name: str) -> Optional[str]:
    base = os.path.basename(config_name).lower()
    if base.startswith(("wikitext", "lm_")):
        return "language_modeling"
    if base.startswith(("wmt", "iwslt", "mt_")):
        return "translation"
    if base.startswith(("imagenet", "cifar", "deit", "pvt", "vit_")):
        return "image_classification"
    return None


def _override_to_flags(key: str, value: str) -> List[str]:
    """One hydra ``key=value`` override -> argv fragment for the train CLI."""
    parts = key.split(".")
    if len(parts) == 2 and parts[0] in _NESTED_PREFIX:
        flag = f"--{_NESTED_PREFIX[parts[0]]}-" + parts[1].replace("_", "-")
    elif len(parts) == 1:
        flag = "--" + key.replace("_", "-")
    else:
        raise ValueError(f"unsupported override key: {key}")
    if value.lower() == "true":
        return [flag]
    if value.lower() == "false":
        # store_true flags cannot be unset through argv; surface it
        raise ValueError(
            f"{key}=false: boolean overrides only support enabling flags")
    return [flag, value]


def parse_overrides(tokens: List[str]) -> Tuple[Optional[str], List[str]]:
    """Returns (task override, argv fragments) from ``key=value`` tokens."""
    task = None
    argv: List[str] = []
    for tok in tokens:
        if "=" not in tok:
            raise ValueError(
                f"override '{tok}' is not key=value (hydra syntax)")
        key, value = tok.split("=", 1)
        if key == "task":
            task = value
            continue
        argv.extend(_override_to_flags(key, value))
    return task, argv


def cli_main(argv=None):
    p = argparse.ArgumentParser("eatpu-hydra-train")
    p.add_argument("--config-dir", default="configs",
                   help="directory holding recipe YAMLs")
    p.add_argument("--config-name", required=True,
                   help="recipe name (with or without .yaml)")
    p.add_argument("overrides", nargs="*",
                   help="hydra-style key=value overrides")
    args = p.parse_args(argv)

    name = args.config_name
    if not name.endswith((".yaml", ".yml")):
        name += ".yaml"
    config_path = os.path.join(args.config_dir, name)
    if not os.path.exists(config_path):
        raise FileNotFoundError(config_path)

    task_override, extra_argv = parse_overrides(args.overrides)
    task = task_override
    if task is None:
        import yaml

        with open(config_path, encoding="utf-8") as f:
            task = (yaml.safe_load(f) or {}).get("task")
    if task is None:
        task = _infer_task(args.config_name)
    if task not in _TASK_CLI:
        raise ValueError(
            f"cannot determine task for {args.config_name}; pass "
            f"task=<{'|'.join(_TASK_CLI)}> as an override or add a "
            "'task:' key to the YAML")

    import importlib

    mod = importlib.import_module(
        f"efficient_attention_tpu.cli.{_TASK_CLI[task]}")
    return mod.cli_main(["--config", config_path] + extra_argv)


if __name__ == "__main__":
    cli_main()
