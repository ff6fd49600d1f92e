"""YAML config composition for the training CLIs — the hydra-path analogue.

The reference carries a hydra/omegaconf stack (``fairseq/dataclass/``,
``fairseq_cli/hydra_train.py``, ``fairseq/config/*.yaml``) alongside the
legacy argparse path.  hydra/omegaconf are not available here, so this
module reproduces the part of that stack the recipes actually use with
pyyaml + the existing nested-argparse surface:

  * ``defaults:`` — a list of other YAML files (relative to the including
    file) merged in order, later files and the including file winning —
    hydra's config-group composition (``fairseq/config/config.yaml``);
  * flat keys map onto argparse dests (``lr: 5e-4`` -> ``args.lr``);
  * nested mappings map onto the nested attention namespaces
    (``attn_args_encoder: {window_size: 8}`` ->
    ``args.attn_args_encoder.window_size``), mirroring what
    ``dataclass/utils.py:400-404`` does with the parsed NestedNamespace;
  * explicit command-line flags override YAML values (hydra's
    ``key=value`` override semantics, with the CLI as the override
    source).

Usage: every train CLI accepts ``--config path.yaml``; values apply on
top of parser defaults and under explicit CLI flags.
"""
from __future__ import annotations

import argparse
import os
from typing import Any, Dict, List, Optional


def load_yaml_config(path: str, _seen: Optional[set] = None) -> Dict[str, Any]:
    """Load a YAML config, recursively composing its ``defaults:`` list."""
    import yaml

    path = os.path.abspath(path)
    _seen = _seen or set()
    if path in _seen:
        raise ValueError(f"circular config include: {path}")
    _seen.add(path)
    with open(path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f) or {}
    if not isinstance(cfg, dict):
        raise ValueError(f"config {path} must be a mapping")
    merged: Dict[str, Any] = {}
    for inc in cfg.pop("defaults", []) or []:
        inc_path = inc if os.path.isabs(inc) else os.path.join(
            os.path.dirname(path), inc)
        for key, val in load_yaml_config(inc_path, _seen).items():
            if isinstance(val, dict) and isinstance(merged.get(key), dict):
                merged[key].update(val)
            else:
                merged[key] = val
    for key, val in cfg.items():
        if isinstance(val, dict) and isinstance(merged.get(key), dict):
            merged[key].update(val)
        else:
            merged[key] = val
    return merged


def _explicit_dests(parser: argparse.ArgumentParser,
                    argv: List[str]) -> set:
    """Dests of options literally present on the command line (these beat
    YAML; mirrors hydra's override precedence)."""
    present = set()
    argv_set = set()
    for tok in argv:
        argv_set.add(tok.split("=", 1)[0] if tok.startswith("--") else tok)
    for action in parser._actions:
        if any(opt in argv_set for opt in action.option_strings):
            present.add(action.dest)
    return present


def apply_yaml_config(args: argparse.Namespace,
                      parser: argparse.ArgumentParser,
                      argv: Optional[List[str]]) -> argparse.Namespace:
    """Apply ``args.config`` (if set) under explicit-CLI-wins semantics."""
    cfg_path = getattr(args, "config", None)
    if not cfg_path:
        return args
    import sys

    cfg = load_yaml_config(cfg_path)
    explicit = _explicit_dests(parser, list(
        sys.argv[1:] if argv is None else argv))
    for key, val in cfg.items():
        dest = key.replace("-", "_")
        if isinstance(val, dict):
            # nested attention-args group: merge into the sub-namespace
            sub = getattr(args, dest, None)
            if sub is None:
                sub = argparse.Namespace()
                setattr(args, dest, sub)
            for k2, v2 in val.items():
                d2 = k2.replace("-", "_")
                if f"{dest}.{d2}" not in explicit:
                    setattr(sub, d2, v2)
        elif dest not in explicit:
            setattr(args, dest, val)
    return args


def add_config_flag(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--config", default=None, metavar="YAML",
        help="YAML config file (composed via its defaults: list); "
             "explicit CLI flags override its values")
