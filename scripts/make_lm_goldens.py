"""Generate language-model golden fixtures from the PyTorch reference.

Builds the reference LM/MT decoder stacks from the reference's OWN modules
(fairseq ``AdaptiveInput``/``AdaptiveSoftmax``/``MultiheadAttention``/
``TransformerDecoderLayerBase``/``TransformerEncoderLayerBase``/
``SinusoidalPositionalEmbedding`` and the ``efficient_attention`` package's
``CausalEVAttention``), runs them on CPU in eval mode, and records
state_dicts + outputs to ``tests/goldens/*.npz`` — the same treatment the
ViT family got (``make_goldens.py``), proving fairseq checkpoints load into
the flax stack (VERDICT r2 item 2).

The fairseq package __init__ hard-requires omegaconf/hydra (absent here)
and its dataclass configs don't import on Python 3.13 (mutable dataclass
defaults), so the *leaf* modules are imported through a stub package
skeleton and the decoder container is assembled by hand mirroring
``fairseq/models/transformer/transformer_decoder.py`` (same submodule
attribute names => same state_dict keys as a real checkpoint).  No
reference code is copied; it is only *executed*.

Shapes are reduced (vocab 120, d 48, 2 layers) but preserve every
structural feature of the recipes: adaptive input + FULLY TIED adaptive
softmax + no final decoder LN (``transformer_lm_wiki103``), causal-EVA
decoder self-attention (wiki103-EVA), and the shared-embedding
EVA-encoder + causal-EVA-decoder MT model (``transformer_wmt_en_de``
+ main.sh EVA flags).

Usage: python scripts/make_lm_goldens.py
"""
from __future__ import annotations

import math
import os
import sys
import types
from argparse import Namespace

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

D = 48
HEADS = 2
FFN = 96
LAYERS = 2
VOCAB = 120
CUTOFFS = [40, 80]
PAD = 1
T, B = 24, 2


def _stub_timm():
    import torch
    import torch.nn as tnn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std).clamp_(-2 * std, 2 * std)
        return t

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    layers.trunc_normal_ = trunc_normal_
    layers.to_2tuple = to_2tuple
    layers.DropPath = DropPath
    models.layers = layers
    timm.models = models
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda f: f
    models.registry = registry
    sys.modules.update({
        "timm": timm, "timm.models": models,
        "timm.models.layers": layers, "timm.models.registry": registry,
    })


def _stub_fairseq():
    """Import the reference's leaf modules through a stub package skeleton
    (no package __init__ runs, no omegaconf/hydra needed)."""
    import importlib

    om = types.ModuleType("omegaconf")
    om.II = lambda s: None
    om.MISSING = "???"

    class DictConfig(dict):
        pass

    om.DictConfig = DictConfig
    om.ListConfig = list
    om.OmegaConf = type("OmegaConf", (), {"is_config": staticmethod(
        lambda x: False)})
    om.open_dict = lambda *a, **k: None
    sys.modules["omegaconf"] = om

    root = "/root/reference/fairseq/fairseq"
    fs = types.ModuleType("fairseq")
    fs.__path__ = [root]
    sys.modules["fairseq"] = fs

    def sub(name):
        m = types.ModuleType("fairseq." + name)
        m.__path__ = [os.path.join(root, name.replace(".", "/"))]
        sys.modules["fairseq." + name] = m
        return m

    fmod = sub("modules")
    fdist = sub("distributed")
    fdist.fsdp_wrap = lambda m, **kw: m
    # transformer_layer imports TransformerConfig for cfg-attribute access
    # only; a plain namespace stands in (the real dataclass stack doesn't
    # import on py>=3.12: mutable dataclass defaults)
    fmodels = sub("models")
    fmodels_tr = sub("models.transformer")
    fmodels_tr.TransformerConfig = type("TransformerConfig", (), {})
    fs.utils = importlib.import_module("fairseq.utils")

    def grab(modname, *names):
        m = importlib.import_module("fairseq.modules." + modname)
        for n in names:
            setattr(fmod, n, getattr(m, n))
        return m

    grab("layer_norm", "LayerNorm")
    grab("gelu", "gelu", "gelu_accurate")
    grab("fairseq_dropout", "FairseqDropout")
    grab("quant_noise", "quant_noise")
    grab("adaptive_input", "AdaptiveInput")
    grab("adaptive_softmax", "AdaptiveSoftmax")
    grab("positional_embedding", "PositionalEmbedding")
    grab("sinusoidal_positional_embedding", "SinusoidalPositionalEmbedding")
    grab("multihead_attention", "MultiheadAttention")
    # the fork's encoder bridge (imports the efficient_attention package)
    sys.path.insert(0, "/root/reference/efficient-attention")
    _stub_timm()
    grab("efficient_attention", "EfficientAttention")
    tl = importlib.import_module("fairseq.modules.transformer_layer")
    fmod.transformer_layer = tl
    return fmod, tl


def _cfg(attn_name_decoder="softmax", attn_args_decoder=None,
         attn_name_encoder="softmax", attn_args_encoder=None,
         normalize_before=True):
    qn = Namespace(pq=0, pq_block_size=8, scalar=0)
    dec = Namespace(embed_dim=D, ffn_embed_dim=FFN, attention_heads=HEADS,
                    normalize_before=normalize_before, layers=LAYERS,
                    xformers_att_config=None)
    enc = Namespace(embed_dim=D, ffn_embed_dim=FFN, attention_heads=HEADS,
                    normalize_before=normalize_before, layers=LAYERS,
                    xformers_att_config=None)
    return Namespace(
        decoder=dec, encoder=enc, quant_noise=qn, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, relu_dropout=0.0,
        activation_fn="relu", export=False, cross_self_attention=False,
        attn_name_decoder=attn_name_decoder,
        attn_args_decoder=attn_args_decoder or {},  # decoder path: dict
        attn_name_encoder=attn_name_encoder,
        # encoder path does vars(cfg.attn_args_encoder): wants a Namespace
        attn_args_encoder=Namespace(**(attn_args_encoder or {})),
        max_target_positions=1024, max_source_positions=1024,
        no_scale_embedding=False,
    )


def _fill_params(module, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in sorted(module.named_parameters()):
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def _future_mask(torch, t):
    return torch.triu(
        torch.full((t, t), float("-inf")), diagonal=1)


def build_ref_lm(fmod, tl, attn_name, attn_args):
    """Hand-assembled ``transformer_lm_wiki103``-structured reference model
    (adaptive input, tied adaptive softmax, normalize_before, NO final LN),
    mirroring ``transformer_decoder.py`` / ``transformer_lm.py`` build
    logic with the same attribute names as a real checkpoint."""
    import torch
    import torch.nn as tnn

    cfg = _cfg(attn_name_decoder=attn_name, attn_args_decoder=attn_args)

    class RefDecoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embed_tokens = fmod.AdaptiveInput(
                VOCAB, PAD, D, 4.0, D, CUTOFFS)
            self.embed_positions = fmod.SinusoidalPositionalEmbedding(
                D, PAD, init_size=1024 + PAD + 1)
            self.layers = tnn.ModuleList([
                tl.TransformerDecoderLayerBase(cfg, no_encoder_attn=True)
                for _ in range(LAYERS)])
            self.adaptive_softmax = fmod.AdaptiveSoftmax(
                VOCAB, D, CUTOFFS + [VOCAB], dropout=0.0, factor=4.0,
                adaptive_inputs=self.embed_tokens, tie_proj=True)
            self.embed_scale = math.sqrt(D)

        def features(self, tokens):
            x = self.embed_scale * self.embed_tokens(tokens)
            x = x + self.embed_positions(tokens)
            x = x.transpose(0, 1)  # T, B, C
            mask = _future_mask(torch, x.size(0))
            for layer in self.layers:
                x, _, _ = layer(x, self_attn_mask=mask)
            return x.transpose(0, 1)  # no final LN (no_decoder_final_norm)

    class RefLM(tnn.Module):
        def __init__(self):
            super().__init__()
            self.decoder = RefDecoder()

    return RefLM()


def lm_golden(attn_name, attn_args, fname, seed):
    import torch

    fmod, tl = _FM
    model = build_ref_lm(fmod, tl, attn_name, attn_args)
    _fill_params(model, seed=seed)
    model.eval()
    rng = np.random.default_rng(seed)
    tokens = rng.integers(2, VOCAB, (B, T))
    tt = torch.as_tensor(tokens, dtype=torch.long)
    with torch.no_grad():
        feats = model.decoder.features(tt)
        logprobs = model.decoder.adaptive_softmax.get_log_prob(feats, None)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez(
        os.path.join(OUT, fname),
        tokens=tokens, features=feats.numpy(), logprobs=logprobs.numpy(),
        **{"sd__" + k: v for k, v in sd.items()})
    print(fname, "features", feats.shape, "logprobs", logprobs.shape,
          "probs sum", float(logprobs.exp().sum(-1).mean()))


def build_ref_mt(fmod, tl):
    """Shared-embedding MT model: EVA encoder (overlap window + t5-rpe +
    no-ln adaptive proj, the main.sh WMT flags) + causal-EVA decoder +
    softmax cross-attention, mirroring ``transformer_encoder.py`` /
    ``transformer_decoder.py`` containers.  (Also consumed by
    ``make_trajectory_goldens.mt_trajectory``.)"""
    import torch
    import torch.nn as tnn
    enc_args = {"window_size": 4, "num_landmarks": 4, "overlap_window": True,
                "use_t5_rpe": True, "adaptive_proj": "no-ln", "attn_2d": False,
                "use_rpe": False}
    dec_args = {"window_size": 4, "chunk_size": 2, "adaptive_proj": "qk",
                "use_t5_rpe": True, "causal": True, "overlap_window": False,
                "num_chunks": -1}
    cfg = _cfg(attn_name_decoder="causal_eva", attn_args_decoder=dec_args,
               attn_name_encoder="eva", attn_args_encoder=enc_args,
               normalize_before=False)

    shared = tnn.Embedding(VOCAB, D, PAD)

    class RefEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embed_tokens = shared
            self.embed_positions = fmod.SinusoidalPositionalEmbedding(
                D, PAD, init_size=1024 + PAD + 1)
            self.layers = tnn.ModuleList([
                tl.TransformerEncoderLayerBase(cfg) for _ in range(LAYERS)])
            self.embed_scale = math.sqrt(D)

        def forward(self, tokens):
            pad_mask = tokens.eq(PAD)
            x = self.embed_scale * self.embed_tokens(tokens)
            x = x + self.embed_positions(tokens)
            x = x.transpose(0, 1)
            for layer in self.layers:
                x = layer(x, encoder_padding_mask=pad_mask)
            return x, pad_mask

    class RefDecoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.embed_tokens = shared
            self.embed_positions = fmod.SinusoidalPositionalEmbedding(
                D, PAD, init_size=1024 + PAD + 1)
            self.layers = tnn.ModuleList([
                tl.TransformerDecoderLayerBase(cfg, no_encoder_attn=False)
                for _ in range(LAYERS)])
            self.output_projection = tnn.Linear(D, VOCAB, bias=False)
            self.output_projection.weight = shared.weight
            self.embed_scale = math.sqrt(D)

        def forward(self, tokens, enc_out, enc_pad):
            x = self.embed_scale * self.embed_tokens(tokens)
            x = x + self.embed_positions(tokens)
            x = x.transpose(0, 1)
            mask = _future_mask(torch, x.size(0))
            for layer in self.layers:
                x, _, _ = layer(
                    x, encoder_out=enc_out, encoder_padding_mask=enc_pad,
                    self_attn_mask=mask)
            return self.output_projection(x.transpose(0, 1))

    class RefMT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = RefEncoder()
            self.decoder = RefDecoder()

        def forward(self, src, prev):
            enc, pad = self.encoder(src)
            return self.decoder(prev, enc, pad)

    return RefMT()


def mt_golden(fname, seed):
    import torch

    fmod, tl = _FM
    model = build_ref_mt(fmod, tl)
    _fill_params(model, seed=seed)
    model.eval()
    rng = np.random.default_rng(seed)
    src = rng.integers(2, VOCAB, (B, T))
    prev = rng.integers(2, VOCAB, (B, T))
    st, pt = (torch.as_tensor(a, dtype=torch.long) for a in (src, prev))
    with torch.no_grad():
        logits = model(st, pt)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez(
        os.path.join(OUT, fname),
        src=src, prev=prev, logits=logits.numpy(),
        **{"sd__" + k: v for k, v in sd.items()})
    print(fname, "logits", logits.shape,
          float(np.abs(logits.numpy()).mean()))


def main():
    global _FM
    _FM = _stub_fairseq()
    lm_golden("softmax", {}, "lm_softmax_adaptive.npz", seed=11)
    lm_golden("causal_eva",
              {"window_size": 8, "chunk_size": 4, "adaptive_proj": "qk",
               "use_t5_rpe": True, "causal": True, "overlap_window": False,
               "num_chunks": -1},
              "lm_causal_eva_adaptive.npz", seed=12)
    mt_golden("mt_eva_causal.npz", seed=13)


if __name__ == "__main__":
    main()
