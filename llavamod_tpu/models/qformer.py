"""Query-former and conv-block token-compressing projectors.

Functional equivalents of the reference's exotic projector options:
  * qformer{L}_{Q} / cheap_qformer{L}_{Q}  (reference qformer.py:9-205):
    proj_in MLP -> Q learned query tokens -> L BERT-style blocks (self-attn
    over queries, cross-attn into image features every layer
    [cross_attention_frequency=1], GELU MLP with ratio 2.6875, post-LN)
    -> proj_out MLP.  "cheap" keeps the trunk at the vision width and only
    projects up to the LLM width at the output.
  * simple_in{I}_out{O} / cheap_simple_in{I}_out{O} (simple_block.py:39-121):
    proj_in MLP -> 2x2 avg-pool (576->144) -> I x [res-conv3x3 + ViT block]
    -> 3x3 VALID conv (12x12 -> 10x10 = 100 tokens) -> O x blocks ->
    proj_out MLP.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from llavamod_tpu.models.projector import Projector, _dense, _apply_dense
from llavamod_tpu.ops.attention import dot_product_attention
from llavamod_tpu.ops.norms import layer_norm

Params = Dict[str, Any]

_QF_MLP_RATIO = 2.6875  # reference qformer.py:107 ("intermediate_size")


def _qf_heads(width: int) -> int:
    """Blip2QFormer head count: the reference config pins 32 heads
    (qformer.py:122 "num_attention_heads": 32); fall back to the largest
    power-of-two divisor for toy widths that 32 doesn't divide."""
    for h in (32, 16, 8, 4, 2):
        if width % h == 0:
            return h
    return 1


def _proj_mlp_init(key, din, dmid, dout, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": _dense(k1, din, dmid, dtype), "fc2": _dense(k2, dmid, dout, dtype)}


def _proj_mlp_apply(p, x):
    return _apply_dense(p["fc2"], jax.nn.gelu(_apply_dense(p["fc1"], x),
                                              approximate=False))


def _ln_init(d, dtype):
    return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _ln(p, x):
    return layer_norm(x, p["weight"], p["bias"], 1e-12)


def _attn_init(key, d, dtype, kv_dim=None):
    kv_dim = kv_dim or d
    ks = jax.random.split(key, 4)
    return {"q": _dense(ks[0], d, d, dtype), "k": _dense(ks[1], kv_dim, d, dtype),
            "v": _dense(ks[2], kv_dim, d, dtype), "o": _dense(ks[3], d, d, dtype)}


def _attn_apply(p, x_q, x_kv, heads):
    b, tq, d = x_q.shape
    dh = d // heads
    q = _apply_dense(p["q"], x_q).reshape(b, tq, heads, dh)
    k = _apply_dense(p["k"], x_kv).reshape(b, x_kv.shape[1], heads, dh)
    v = _apply_dense(p["v"], x_kv).reshape(b, x_kv.shape[1], heads, dh)
    out = dot_product_attention(q, k, v, causal=False, impl="xla")
    return _apply_dense(p["o"], out.reshape(b, tq, d))


def build_qformer_projector(spec: str, vision_dim: int, llm_dim: int,
                            num_layers: int, num_queries: int,
                            cheap: bool = False) -> Projector:
    width = vision_dim if cheap else llm_dim
    inter = int(width * _QF_MLP_RATIO)

    def init(key, dtype=jnp.float32):
        ks = jax.random.split(key, num_layers + 3)
        if cheap:
            proj_in = _proj_mlp_init(ks[0], vision_dim, vision_dim, vision_dim, dtype)
            proj_out = _proj_mlp_init(ks[1], vision_dim, llm_dim, llm_dim, dtype)
        else:
            proj_in = _proj_mlp_init(ks[0], vision_dim, llm_dim, llm_dim, dtype)
            proj_out = _proj_mlp_init(ks[1], llm_dim, llm_dim, llm_dim, dtype)
        layers = []
        for i in range(num_layers):
            lk = jax.random.split(ks[2 + i], 4)
            layers.append({
                "self_attn": _attn_init(lk[0], width, dtype),
                "ln_self": _ln_init(width, dtype),
                "cross_attn": _attn_init(lk[1], width, dtype, kv_dim=width),
                "ln_cross": _ln_init(width, dtype),
                "mlp": _proj_mlp_init(lk[2], width, inter, width, dtype),
                "ln_mlp": _ln_init(width, dtype),
            })
        return {
            "proj_in": proj_in,
            "queries": jnp.zeros((num_queries, width), dtype),
            # Blip2QFormerModel.layernorm: applied to the query embeddings
            # before layer 0 (modeling_blip_2.py Blip2QFormerModel.forward)
            "ln_embed": _ln_init(width, dtype),
            "layers": layers,
            "proj_out": proj_out,
        }

    heads = _qf_heads(width)

    def apply(p, x):
        """x: [B, N, vision_dim] -> [B, Q, llm_dim]."""
        b = x.shape[0]
        img = _proj_mlp_apply(p["proj_in"], x)
        h = jnp.broadcast_to(p["queries"], (b,) + p["queries"].shape)
        h = _ln(p["ln_embed"], h)
        for lp in p["layers"]:
            # post-LN (BERT) residual blocks, cross-attention every layer
            h = _ln(lp["ln_self"], h + _attn_apply(lp["self_attn"], h, h, heads))
            h = _ln(lp["ln_cross"],
                    h + _attn_apply(lp["cross_attn"], h, img, heads))
            h = _ln(lp["ln_mlp"], h + _proj_mlp_apply(lp["mlp"], h))
        return _proj_mlp_apply(p["proj_out"], h)

    return Projector(spec, init, apply, lambda n: num_queries)


# ---------------------------------------------------------------------------
# simple conv/ViT token reducer
# ---------------------------------------------------------------------------

def _conv3x3_init(key, d, dtype, padding_same: bool):
    w = jax.random.normal(key, (3, 3, d, d), jnp.float32) * ((9 * d) ** -0.5)
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((d,), dtype),
            "same": padding_same}


def _conv3x3_apply(p, x_grid):
    """x_grid: [B, H, W, D] NHWC conv."""
    pad = "SAME" if p["same"] else "VALID"
    out = jax.lax.conv_general_dilated(
        x_grid, p["kernel"], window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def _to_grid(x):
    b, n, d = x.shape
    g = int(math.isqrt(n))
    return x.reshape(b, g, g, d)


def _to_tokens(x):
    b, h, w, d = x.shape
    return x.reshape(b, h * w, d)


def _vit_block_init(key, d, heads, mlp_ratio, dtype):
    ks = jax.random.split(key, 3)
    return {
        "ln1": _ln_init(d, dtype),
        "attn": _attn_init(ks[0], d, dtype),
        "ln2": _ln_init(d, dtype),
        "mlp": _proj_mlp_init(ks[1], d, int(d * mlp_ratio), d, dtype),
        "heads": heads,
    }


def _vit_block_apply(p, x):
    h = _ln(p["ln1"], x)
    x = x + _attn_apply(p["attn"], h, h, p["heads"])
    return x + _proj_mlp_apply(p["mlp"], _ln(p["ln2"], x))


def _res_conv_init(key, d, dtype):
    return {"norm": _ln_init(d, dtype), "conv": _conv3x3_init(key, d, dtype, True)}


def _res_conv_apply(p, x):
    g = _to_grid(x)
    h = _ln(p["norm"], g)
    h = jax.nn.gelu(_conv3x3_apply(p["conv"], h), approximate=False)
    return _to_tokens(g + h)


def build_simple_projector(spec: str, vision_dim: int, llm_dim: int,
                           num_in: int, num_out: int,
                           cheap: bool = False) -> Projector:
    width = vision_dim if cheap else llm_dim
    # reference SimpleBlock num_heads=32 (simple_block.py:40); divisor
    # fallback keeps toy widths runnable
    heads = _qf_heads(width)
    mlp_ratio = 4.0 if cheap else _QF_MLP_RATIO

    def init(key, dtype=jnp.float32):
        ks = jax.random.split(key, 3 + 2 * (num_in + num_out))
        if cheap:
            proj_in = _proj_mlp_init(ks[0], vision_dim, vision_dim, vision_dim, dtype)
            proj_out = _proj_mlp_init(ks[1], vision_dim, llm_dim, llm_dim, dtype)
        else:
            proj_in = _proj_mlp_init(ks[0], vision_dim, llm_dim, llm_dim, dtype)
            proj_out = _proj_mlp_init(ks[1], llm_dim, llm_dim, llm_dim, dtype)
        p: Params = {"proj_in": proj_in, "proj_out": proj_out,
                     "blocks_in": [], "blocks_out": []}
        ki = 2
        for _ in range(num_in):
            p["blocks_in"].append({
                "conv": _res_conv_init(ks[ki], width, dtype),
                "vit": _vit_block_init(ks[ki + 1], width, heads, mlp_ratio, dtype)})
            ki += 2
        if num_out > 0:
            p["down2"] = _conv3x3_init(ks[ki], width, dtype, False)
            ki += 1
            for _ in range(num_out):
                p["blocks_out"].append({
                    "conv": _res_conv_init(ks[ki], width, dtype),
                    "vit": _vit_block_init(ks[ki], width, heads, mlp_ratio, dtype)})
                ki += 1
        return p

    def apply(p, x):
        x = _proj_mlp_apply(p["proj_in"], x)
        # 2x2 average pool on the grid
        g = _to_grid(x)
        b, hh, ww, d = g.shape
        g = g.reshape(b, hh // 2, 2, ww // 2, 2, d).mean(axis=(2, 4))
        x = _to_tokens(g)
        for blk in p["blocks_in"]:
            x = _res_conv_apply(blk["conv"], x)
            x = _vit_block_apply(blk["vit"], x)
        if "down2" in p:
            x = _to_tokens(_conv3x3_apply(p["down2"], _to_grid(x)))
            for blk in p["blocks_out"]:
                x = _res_conv_apply(blk["conv"], x)
                x = _vit_block_apply(blk["vit"], x)
        return _proj_mlp_apply(p["proj_out"], x)

    def n_out(n):
        g = int(math.isqrt(n)) // 2
        if num_out > 0:
            g = g - 2  # 3x3 VALID conv
        return g * g

    return Projector(spec, init, apply, n_out)
