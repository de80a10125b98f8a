"""Independent torch oracles for families transformers doesn't ship.

Qwen-1.0 and MiniCPM exist upstream only as trust_remote_code modelings (the
reference vendors them under model/language_model/{qwen,minicpm}).  These are
compact, independent re-implementations of their forward semantics — written
from the papers'/modelings' math, not transcribed — used as logit oracles in
tests/test_hf_parity.py.  State-dict key names match the HF checkpoints so
interop.hf.decoder_params_from_hf consumes them directly.

Semantics covered:
  * MiniCPM (reference minicpm/modeling_minicpm.py): llama block + mup
    scalings — embeds * scale_emb (:1040), sublayer outputs *
    scale_depth/sqrt(L) (:818,825), hidden / (hidden/dim_model_base) before
    the tied head (:1214).
  * Qwen-1.0 (reference qwen/modeling_qwen.py): fused c_attn [3D, D] split
    (:416-418), RMSNorm ln_1/ln_2, MLP `w1(x) * silu(w2(x))` -> c_proj
    (:570-575), full-head-dim half-split rotary (:1324-1353).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _rotate_half(x):
    half = x.shape[-1] // 2
    return torch.cat([-x[..., half:], x[..., :half]], dim=-1)


def _rope(positions, dim, theta):
    inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
    freqs = positions.float()[:, None] * inv[None, :]
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


class _RMSNorm(nn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        xf = x.float()
        v = xf.pow(2).mean(-1, keepdim=True)
        return (xf * torch.rsqrt(v + self.eps) * self.weight.float()).to(x.dtype)


def _causal_attn(q, k, v, scale):
    # q/k/v: [B, T, H, dh] -> [B, T, H*dh]
    b, t, h, dh = q.shape
    q = q.permute(0, 2, 1, 3)
    k = k.permute(0, 2, 1, 3)
    v = v.permute(0, 2, 1, 3)
    logits = torch.matmul(q.float(), k.float().transpose(-1, -2)) * scale
    mask = torch.triu(torch.ones(t, t, dtype=torch.bool), diagonal=1)
    logits = logits.masked_fill(mask, float("-inf"))
    probs = torch.softmax(logits, dim=-1)
    out = torch.matmul(probs, v.float()).to(v.dtype)
    return out.permute(0, 2, 1, 3).reshape(b, t, h * dh)


# ---------------------------------------------------------------------------
# MiniCPM
# ---------------------------------------------------------------------------

class _MiniCPMAttention(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg["hidden_size"]
        self.heads = cfg["num_heads"]
        self.head_dim = d // self.heads
        self.theta = cfg["rope_theta"]
        self.q_proj = nn.Linear(d, d, bias=False)
        self.k_proj = nn.Linear(d, d, bias=False)
        self.v_proj = nn.Linear(d, d, bias=False)
        self.o_proj = nn.Linear(d, d, bias=False)

    def forward(self, x):
        b, t, d = x.shape
        q = self.q_proj(x).view(b, t, self.heads, self.head_dim)
        k = self.k_proj(x).view(b, t, self.heads, self.head_dim)
        v = self.v_proj(x).view(b, t, self.heads, self.head_dim)
        cos, sin = _rope(torch.arange(t), self.head_dim, self.theta)
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
        q = (q.float() * cos + _rotate_half(q.float()) * sin).to(x.dtype)
        k = (k.float() * cos + _rotate_half(k.float()) * sin).to(x.dtype)
        out = _causal_attn(q, k, v, self.head_dim ** -0.5)
        return self.o_proj(out)


class _MiniCPMMLP(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, f = cfg["hidden_size"], cfg["intermediate_size"]
        self.gate_proj = nn.Linear(d, f, bias=False)
        self.up_proj = nn.Linear(d, f, bias=False)
        self.down_proj = nn.Linear(f, d, bias=False)

    def forward(self, x):
        return self.down_proj(F.silu(self.gate_proj(x)) * self.up_proj(x))


class _MiniCPMLayer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.self_attn = _MiniCPMAttention(cfg)
        self.mlp = _MiniCPMMLP(cfg)
        self.input_layernorm = _RMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.post_attention_layernorm = _RMSNorm(cfg["hidden_size"],
                                                 cfg["rms_norm_eps"])
        self.res_scale = cfg["scale_depth"] / math.sqrt(cfg["num_layers"])

    def forward(self, x):
        x = x + self.self_attn(self.input_layernorm(x)) * self.res_scale
        x = x + self.mlp(self.post_attention_layernorm(x)) * self.res_scale
        return x


class _MiniCPMInner(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.embed_tokens = nn.Embedding(cfg["vocab_size"], cfg["hidden_size"])
        self.layers = nn.ModuleList(
            [_MiniCPMLayer(cfg) for _ in range(cfg["num_layers"])])
        self.norm = _RMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])


class TinyMiniCPM(nn.Module):
    """Tied-head MiniCPM with HF key names (model.layers.{i}.self_attn...)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.model = _MiniCPMInner(cfg)

    def forward(self, ids):
        x = self.model.embed_tokens(ids) * self.cfg["scale_emb"]
        for layer in self.model.layers:
            x = layer(x)
        x = self.model.norm(x)
        x = x / (self.cfg["hidden_size"] / self.cfg["dim_model_base"])
        return F.linear(x, self.model.embed_tokens.weight)


# ---------------------------------------------------------------------------
# Qwen-1.0
# ---------------------------------------------------------------------------

class _QwenV1Attention(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg["hidden_size"]
        self.heads = cfg["num_heads"]
        self.head_dim = d // self.heads
        self.theta = cfg["rope_theta"]
        self.c_attn = nn.Linear(d, 3 * d, bias=True)
        self.c_proj = nn.Linear(d, d, bias=False)

    def forward(self, x):
        b, t, d = x.shape
        q, k, v = self.c_attn(x).split(d, dim=2)
        q = q.view(b, t, self.heads, self.head_dim)
        k = k.view(b, t, self.heads, self.head_dim)
        v = v.view(b, t, self.heads, self.head_dim)
        cos, sin = _rope(torch.arange(t), self.head_dim, self.theta)
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
        q = (q.float() * cos + _rotate_half(q.float()) * sin).to(x.dtype)
        k = (k.float() * cos + _rotate_half(k.float()) * sin).to(x.dtype)
        out = _causal_attn(q, k, v, self.head_dim ** -0.5)
        return self.c_proj(out)


class _QwenV1MLP(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, f = cfg["hidden_size"], cfg["intermediate_size"]  # f = half of HF's
        self.w1 = nn.Linear(d, f, bias=False)
        self.w2 = nn.Linear(d, f, bias=False)
        self.c_proj = nn.Linear(f, d, bias=False)

    def forward(self, x):
        return self.c_proj(self.w1(x) * F.silu(self.w2(x)))


class _QwenV1Block(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.ln_1 = _RMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.attn = _QwenV1Attention(cfg)
        self.ln_2 = _RMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.mlp = _QwenV1MLP(cfg)

    def forward(self, x):
        x = x + self.attn(self.ln_1(x))
        return x + self.mlp(self.ln_2(x))


class _QwenV1Inner(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.wte = nn.Embedding(cfg["vocab_size"], cfg["hidden_size"])
        self.h = nn.ModuleList(
            [_QwenV1Block(cfg) for _ in range(cfg["num_layers"])])
        self.ln_f = _RMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])


class TinyQwenV1(nn.Module):
    """Untied-head Qwen-1.0 with HF key names (transformer.h.{i}.attn...)."""

    def __init__(self, cfg):
        super().__init__()
        self.transformer = _QwenV1Inner(cfg)
        self.lm_head = nn.Linear(cfg["hidden_size"], cfg["vocab_size"],
                                 bias=False)

    def forward(self, ids):
        x = self.transformer.wte(ids)
        for block in self.transformer.h:
            x = block(x)
        x = self.transformer.ln_f(x)
        return self.lm_head(x)
