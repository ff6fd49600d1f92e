"""Generate golden cross-framework fixtures from the PyTorch reference.

Runs the reference attention modules (/root/reference/efficient-attention,
torch CPU, eval mode) with deterministically-filled parameters and dumps
(input, output, named parameters) to ``tests/goldens/*.npz``.  The repo's
tests (``tests/test_goldens.py``) load these and assert the JAX modules
reproduce the reference outputs bit-for-tolerance — SURVEY §7.1's golden
test strategy.  No reference code is copied; it is only *executed* here.

Usage: python scripts/make_goldens.py   (requires /root/reference)
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def _stub_timm():
    """The reference imports trunc_normal_/to_2tuple/DropPath/register_model
    from timm (not installed here); parameters get overwritten anyway and
    DropPath is identity in eval mode."""
    import torch

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    models.__path__ = []
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    vt = types.ModuleType("timm.models.vision_transformer")

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std).clamp_(-2 * std, 2 * std)
        return t

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    layers.trunc_normal_ = trunc_normal_
    layers.to_2tuple = to_2tuple
    layers.DropPath = DropPath
    registry.register_model = lambda fn: fn
    vt._cfg = lambda url="", **kw: dict(url=url, **kw)
    models.layers = layers
    models.registry = registry
    models.vision_transformer = vt
    timm.models = models
    sys.modules.update({"timm": timm, "timm.models": models,
                        "timm.models.layers": layers,
                        "timm.models.registry": registry,
                        "timm.models.vision_transformer": vt})


def _fill_params(module, seed=0):
    import torch

    rng = np.random.default_rng(seed)
    for name, p in sorted(module.named_parameters()):
        vals = rng.normal(0, 0.05, p.shape).astype(np.float32)
        with torch.no_grad():
            p.copy_(torch.from_numpy(vals))


def _dump(path, module, x, out):
    arrays = {"x": x.numpy(), "out": out.numpy()}
    for name, p in module.named_parameters():
        arrays["param:" + name] = p.detach().numpy()
    np.savez(path, **arrays)
    print(f"wrote {path}: x{arrays['x'].shape} -> out{arrays['out'].shape}, "
          f"{len(arrays) - 2} params")


def main():
    _stub_timm()
    sys.path.insert(0, "/root/reference/efficient-attention")
    import torch

    from efficient_attention import EVA, LocalAttention

    os.makedirs(OUT_DIR, exist_ok=True)
    torch.manual_seed(0)
    rng = np.random.default_rng(42)
    x2d = torch.from_numpy(
        rng.normal(0, 1, (2, 8, 8, 48)).astype(np.float32))

    # EVA: 2-D, learned RPE, adaptive proj (the flagship ViT config)
    m = EVA(dim=48, num_heads=4, window_size=4, num_landmarks=4,
            attn_2d=True, use_rpe=True, adaptive_proj="default",
            overlap_window=False)
    m.eval()
    _fill_params(m, seed=1)
    with torch.no_grad():
        out = m(x2d.clone())
    _dump(os.path.join(OUT_DIR, "eva_2d_rpe.npz"), m, x2d, out)

    # LocalAttention: 2-D windows + learned RPE
    m = LocalAttention(dim=48, num_heads=4, window_size=4, attn_2d=True,
                       use_rpe=True)
    m.eval()
    _fill_params(m, seed=2)
    with torch.no_grad():
        out = m(x2d.clone())
    _dump(os.path.join(OUT_DIR, "local_2d_rpe.npz"), m, x2d, out)

    # Exact softmax base attention
    from efficient_attention import MultiheadAttention

    x1d = torch.from_numpy(
        rng.normal(0, 1, (2, 16, 48)).astype(np.float32))
    m = MultiheadAttention(dim=48, num_heads=4)
    m.eval()
    _fill_params(m, seed=3)
    with torch.no_grad():
        out = m(x1d.clone())
    _dump(os.path.join(OUT_DIR, "softmax_mha.npz"), m, x1d, out)

    # CausalEVA parallel (full-sequence) path, t5-rpe, adaptive 'qk' — the
    # wikitext-103 LM config (window 8 scaled down, chunk 4)
    import argparse

    from efficient_attention import CausalEVAttention

    aa = argparse.Namespace(window_size=8, overlap_window=False, causal=True,
                            num_chunks=-1, chunk_size=4, use_t5_rpe=True,
                            adaptive_proj="qk")
    m = CausalEVAttention(embed_dim=48, num_heads=4, attn_args=aa)
    m.eval()
    _fill_params(m, seed=4)
    xt = x1d.transpose(0, 1).contiguous()  # reference is time-major
    with torch.no_grad():
        out = m(xt.clone(), xt.clone(), xt.clone())
    out = out[0] if isinstance(out, tuple) else out
    _dump(os.path.join(OUT_DIR, "causal_eva_parallel.npz"), m, x1d,
          out.transpose(0, 1).contiguous())  # store batch-major


def lara_golden():
    _stub_timm()
    sys.path.insert(0, "/root/reference/efficient-attention")
    import torch

    from efficient_attention import LinearRA

    rng = np.random.default_rng(7)
    x2d = torch.from_numpy(
        rng.normal(0, 1, (2, 8, 8, 48)).astype(np.float32))
    # the tracked LARA configuration (mis-opt, pool-mixed) scaled down
    m = LinearRA(dim=48, num_heads=4, num_landmarks=4,
                 proposal_gen="pool-mixed", mis_type="mis-opt",
                 alpha_coeff=2.0)
    m.eval()
    _fill_params(m, seed=5)
    with torch.no_grad():
        out = m(x2d.clone())
    _dump(os.path.join(OUT_DIR, "lara_pool_mixed.npz"), m, x2d, out)


def kernelized_golden():
    """Performer/favorp golden: ``sample_scheme='learnable'`` makes the
    random projection a recorded *parameter*, so both frameworks consume
    the identical matrix (eval-mode 'default' buffers are RNG-dependent
    and cannot cross frameworks)."""
    _stub_timm()
    sys.path.insert(0, "/root/reference/efficient-attention")
    import torch

    from efficient_attention import KernelizedAttention

    rng = np.random.default_rng(11)
    x1d = torch.from_numpy(
        rng.normal(0, 1, (2, 16, 48)).astype(np.float32))
    m = KernelizedAttention(dim=48, num_heads=4, proj_method="favorp",
                            sample_scheme="learnable", approx_attn_dim=32)
    m.eval()
    _fill_params(m, seed=6)
    # scale-1 projection (0.05-scale features barely discriminate)
    with torch.no_grad():
        m.random_proj.copy_(torch.from_numpy(
            rng.normal(0, 1, m.random_proj.shape).astype(np.float32)))
    with torch.no_grad():
        out = m(x1d.clone())
    _dump(os.path.join(OUT_DIR, "kernelized_favorp.npz"), m, x1d, out)


def scatterbrain_golden():
    """ScatterBrain (sparse local + log-space favorp low-rank) golden,
    2-D windows, learnable projection (same rationale as above)."""
    _stub_timm()
    sys.path.insert(0, "/root/reference/efficient-attention")
    import torch

    from efficient_attention import ScatterBrain

    rng = np.random.default_rng(12)
    x2d = torch.from_numpy(
        rng.normal(0, 1, (2, 8, 8, 48)).astype(np.float32))
    m = ScatterBrain(dim=48, num_heads=4, window_size=4, attn_2d=True,
                     proj_method="favorp", sample_scheme="learnable",
                     approx_attn_dim=32)
    m.eval()
    _fill_params(m, seed=8)
    with torch.no_grad():
        m.random_proj.copy_(torch.from_numpy(
            rng.normal(0, 1, m.random_proj.shape).astype(np.float32)))
    with torch.no_grad():
        out = m(x2d.clone())
    _dump(os.path.join(OUT_DIR, "scatterbrain.npz"), m, x2d, out)


def full_model_golden():
    """Whole DeiT-style model (reference ``EfficientTransformer`` with EVA
    blocks) on a downsized config: recorded state_dict + input + logits.
    ``tests/test_interop.py`` converts the state_dict with
    ``efficient_attention_tpu.interop`` and must reproduce the logits —
    proving reference checkpoints load into this framework."""
    import argparse

    _stub_timm()
    sys.path.insert(0, "/root/reference/efficient-attention")
    sys.path.insert(0, "/root/reference/vit")
    import torch

    from models.efficient_vit import EfficientTransformer

    args = argparse.Namespace(
        num_classes=10, input_size=112, in_chans=3, patch_size=8,
        embed_dim=48, depth=2, num_heads=4, mlp_ratio=4, qkv_bias=True,
        qk_scale=None, norm_layer=None, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0, no_pos_emb=False, patchify_stem="default",
        pool_method="mean", use_glu=False, attn_name="eva",
        attn_specific_args=argparse.Namespace(
            window_size=7, num_landmarks=49, attn_2d=True, use_rpe=True,
            adaptive_proj="default"),
    )
    net = EfficientTransformer(args)
    net.eval()
    _fill_params(net, seed=13)
    rng = np.random.default_rng(13)
    x = torch.from_numpy(
        rng.normal(0, 1, (2, 3, 112, 112)).astype(np.float32))
    with torch.no_grad():
        out = net(x.clone())
    # store channels-last input (this framework's layout)
    arrays = {"x": x.permute(0, 2, 3, 1).numpy(), "out": out.numpy()}
    for name, p in net.state_dict().items():
        arrays["sd:" + name] = p.detach().numpy()
    path = os.path.join(OUT_DIR, "evit_full_model.npz")
    np.savez(path, **arrays)
    print(f"wrote {path}: x{arrays['x'].shape} -> out{arrays['out'].shape}, "
          f"{len(arrays) - 2} state-dict entries")


def pvt_full_model_golden():
    """Whole PVTv2 model (reference ``pvt_legacy.py`` with EVA at every
    stage) on a downsized config — same purpose as
    :func:`full_model_golden` but for the second model family (4-stage
    pyramid, overlap patch embeds, depthwise-conv MLP)."""
    import argparse

    _stub_timm()
    sys.path.insert(0, "/root/reference/efficient-attention")
    sys.path.insert(0, "/root/reference/vit")
    import torch

    from models.pvt_legacy import pvt_nano

    args = argparse.Namespace(
        num_classes=10, input_size=64, in_chans=3, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0, attn_name="eva",
        num_heads=None, use_glu=False, pool_method="mean",
        use_conv_patchify=False, qkv_bias=True, qk_scale=None,
        attn_specific_args=argparse.Namespace(
            window_size=2, num_landmarks=4, attn_2d=True, use_rpe=True,
            adaptive_proj="default"),
    )
    net = pvt_nano(args)
    net.eval()
    _fill_params(net, seed=17)
    rng = np.random.default_rng(17)
    x = torch.from_numpy(
        rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32))
    with torch.no_grad():
        out = net(x.clone())
    arrays = {"x": x.permute(0, 2, 3, 1).numpy(), "out": out.numpy()}
    for name, p in net.state_dict().items():
        arrays["sd:" + name] = p.detach().numpy()
    path = os.path.join(OUT_DIR, "pvt_full_model.npz")
    np.savez(path, **arrays)
    print(f"wrote {path}: x{arrays['x'].shape} -> out{arrays['out'].shape}, "
          f"{len(arrays) - 2} state-dict entries")


def softmax_full_model_golden():
    """Whole DeiT-style model with exact-softmax attention — the reference's
    baseline checkpoints; same purpose as :func:`full_model_golden`."""
    import argparse

    _stub_timm()
    sys.path.insert(0, "/root/reference/efficient-attention")
    sys.path.insert(0, "/root/reference/vit")
    import torch

    from models.efficient_vit import EfficientTransformer

    args = argparse.Namespace(
        num_classes=10, input_size=112, in_chans=3, patch_size=8,
        embed_dim=48, depth=2, num_heads=4, mlp_ratio=4, qkv_bias=True,
        qk_scale=None, norm_layer=None, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0, no_pos_emb=False, patchify_stem="default",
        pool_method="mean", use_glu=False, attn_name="softmax",
        attn_specific_args=argparse.Namespace(),
    )
    net = EfficientTransformer(args)
    net.eval()
    _fill_params(net, seed=23)
    rng = np.random.default_rng(23)
    x = torch.from_numpy(
        rng.normal(0, 1, (2, 3, 112, 112)).astype(np.float32))
    with torch.no_grad():
        out = net(x.clone())
    arrays = {"x": x.permute(0, 2, 3, 1).numpy(), "out": out.numpy()}
    for name, p in net.state_dict().items():
        arrays["sd:" + name] = p.detach().numpy()
    path = os.path.join(OUT_DIR, "softmax_full_model.npz")
    np.savez(path, **arrays)
    print(f"wrote {path}: x{arrays['x'].shape} -> out{arrays['out'].shape}, "
          f"{len(arrays) - 2} state-dict entries")


if __name__ == "__main__":
    main()
    lara_golden()
    kernelized_golden()
    scatterbrain_golden()
    full_model_golden()
    pvt_full_model_golden()
    softmax_full_model_golden()
