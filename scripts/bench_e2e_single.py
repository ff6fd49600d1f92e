"""E2e DeiT-tiny-p8 eval-throughput race: single-pass EVA kernel vs the
two-kernel packed path, using bench.py's own model/timing code.

Usage: python scripts/bench_e2e_single.py
"""
from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # noqa: E702,E501

from bench import EVA_ARGS, throughput
from efficient_attention_tpu.models import create_model

for label, extra in [("single", {"use_single_kernel": True}),
                     ("packed", {"use_single_kernel": False})]:
    model = create_model(
        "evit_tiny_p8", attn_name="eva",
        attn_args=dict(EVA_ARGS, impl="auto", **extra),
        img_size=224, num_classes=1000)
    ips = throughput(model)
    print(f"[{label}] {ips:8.1f} img/s", flush=True)
