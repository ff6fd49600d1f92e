"""Fused TPU (Pallas/Mosaic) kernels for the attention hot paths.

Kernel inventory vs SURVEY §7.5:
  (a) blocked local attention w/ RPE  -> local_packed.py (2.5x the XLA path)
  (b) fused EVA joint softmax         -> eva_packed.py (fwd + flash-style
      fused backward; eva_kernel.py / eva_rowmajor.py kept as earlier
      Swin-layout / row-major designs and test oracles)
  (c) LARA fused proposal/SNIS        -> intentionally NOT a kernel: the
      LARA hot path is dense [N, C] matmuls + elementwise log-ops that XLA
      already fuses — measured 1.7x over exact softmax at seq 784 with no
      custom kernel, and a kernel would add a fusion boundary.
  (d) prm/favorp feature maps fused   -> intentionally NOT a kernel: the
      Performer path (feature map + two chained matmuls) measures 2.1x over
      exact softmax at seq 784 in pure XLA; the feature map fuses into the
      first contraction's epilogue already.
  (e) causal-EVA parallel path        -> causal_packed.py (fwd + fused
      backward; merged-operand design shared with (b)).  In-module 1.17x
      fwd / 1.13x train over the XLA path at the wikitext geometry
      (T=2048, w=128, c=8) — the XLA causal path is already well-fused
      (windows are large and aligned), and the LM train STEP is
      vocab-softmax-bound (32k logits), so its e2e delta is ~0; the kernel
      still removes the [B,H,G,i,C] HBM logits and wins where attention
      dominates.

The packed kernels' design rule (learned the hard way — see
eva_packed.py's module docstring): a kernel's in-model cost is dominated by
the layouts it forces on its producers/consumers, not by its FLOPs.
"""
from efficient_attention_tpu.ops.pallas.causal_packed import (
    causal_eva_packed,
    supports_causal_packed,
)
from efficient_attention_tpu.ops.pallas.eva_kernel import eva_attention_fused
from efficient_attention_tpu.ops.pallas.eva_packed import (
    eva_attention_packed,
    supports_packed,
)
from efficient_attention_tpu.ops.pallas.local_packed import (
    local_attention_packed,
)

__all__ = [
    "eva_attention_fused", "eva_attention_packed", "supports_packed",
    "local_attention_packed", "causal_eva_packed", "supports_causal_packed",
]
