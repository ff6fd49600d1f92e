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

The packed kernels' design rule (learned the hard way — see
eva_packed.py's module docstring): a kernel's in-model cost is dominated by
the layouts it forces on its producers/consumers, not by its FLOPs.
"""
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
    "local_attention_packed",
]
