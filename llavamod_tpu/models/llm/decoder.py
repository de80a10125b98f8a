"""The decoder LLM: one flag-driven implementation for every family.

Pure-functional: `init(cfg, key)` builds a param pytree; `forward(...)` is a
jit-/grad-/pjit-safe function of (params, batch).  Replaces the reference's
vendored per-family modelings (SURVEY.md §2.7) and their MoE monkey-patched
clones (§2.6) — MoE here is just a layer whose `mlp` params carry an expert
axis, produced by the upcycling transform in models/llm/upcycle.py.

Numerics match HF semantics (fp32 norms/softmax/rope, bf16 matmuls) so
converted checkpoints reproduce logits (tests/test_hf_parity.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from llavamod_tpu.models.llm.config import DecoderConfig
from llavamod_tpu.ops.attention import dot_product_attention
from llavamod_tpu.ops.decode_attention import flash_decode
from llavamod_tpu.ops.moe import (
    GatingConfig,
    moe_ffn,
    moe_ffn_gather,
    moe_ffn_gather_grouped,
    moe_ffn_ragged,
    moe_ffn_ragged_grouped,
    top_k_gating,
    top_k_gating_compact,
)
from llavamod_tpu.ops.norms import layer_norm, rms_norm
from llavamod_tpu.ops.rope import apply_rope, rope_table

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _dense_init(key, d_in, d_out, dtype, scale=None):
    scale = (1.0 / d_in) ** 0.5 if scale is None else scale
    return (jax.random.normal(key, (d_in, d_out), jnp.float32) * scale).astype(dtype)


def _norm_params(cfg: DecoderConfig, dtype) -> Params:
    p = {"weight": jnp.ones((cfg.hidden_size,), dtype)}
    if cfg.norm == "layernorm":
        p["bias"] = jnp.zeros((cfg.hidden_size,), dtype)
    return p


def init_mlp(cfg: DecoderConfig, key, dtype=jnp.float32) -> Params:
    d, f = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 3)
    p: Params = {"up": _dense_init(ks[1], d, f, dtype),
                 "down": _dense_init(ks[2], f, d, dtype)}
    if cfg.gated_mlp:
        p["gate"] = _dense_init(ks[0], d, f, dtype)
    if cfg.mlp_bias:
        p["up_bias"] = jnp.zeros((f,), dtype)
        p["down_bias"] = jnp.zeros((d,), dtype)
    return p


def init_moe_mlp(cfg: DecoderConfig, key, dtype=jnp.float32) -> Params:
    """Fresh-init MoE block matching the upcycle() output structure
    (models/llm/upcycle.py): stacked per-expert FFNs + zero router."""
    e = cfg.moe_num_experts
    ks = jax.random.split(key, e + 1)
    experts_list = [init_mlp(cfg, ks[i], dtype) for i in range(e)]
    experts = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *experts_list)
    p: Params = {"router": jnp.zeros((cfg.hidden_size, e), dtype),
                 "experts": experts}
    if cfg.moe_use_residual:
        p["residual_mlp"] = init_mlp(cfg, ks[-1], dtype)
        p["coef"] = jnp.zeros((cfg.hidden_size, 2), dtype)
    return p


def init_layer(cfg: DecoderConfig, key, dtype=jnp.float32,
               layer_idx: Optional[int] = None) -> Params:
    d = cfg.hidden_size
    h, kh, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = jax.random.split(key, 8)
    attn: Params = {
        "wq": _dense_init(ks[0], d, h * dh, dtype),
        "wk": _dense_init(ks[1], d, kh * dh, dtype),
        "wv": _dense_init(ks[2], d, kh * dh, dtype),
        "wo": _dense_init(ks[3], h * dh, d, dtype),
    }
    if cfg.qkv_bias:
        attn["bq"] = jnp.zeros((h * dh,), dtype)
        attn["bk"] = jnp.zeros((kh * dh,), dtype)
        attn["bv"] = jnp.zeros((kh * dh,), dtype)
    if cfg.o_bias:
        attn["bo"] = jnp.zeros((d,), dtype)

    is_moe_layer = (cfg.is_moe and layer_idx is not None
                    and layer_idx in cfg.moe_layers)
    layer: Params = {
        "input_norm": _norm_params(cfg, dtype),
        "attn": attn,
        "mlp": (init_moe_mlp(cfg, ks[4], dtype) if is_moe_layer
                else init_mlp(cfg, ks[4], dtype)),
    }
    if not cfg.parallel_block:
        layer["post_attn_input_norm"] = _norm_params(cfg, dtype)
    if cfg.post_attn_norm:
        layer["post_attn_norm"] = _norm_params(cfg, dtype)
    if cfg.post_mlp_norm:
        layer["post_mlp_norm"] = _norm_params(cfg, dtype)
    return layer


def init(cfg: DecoderConfig, key, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.num_layers + 2)
    params: Params = {
        "embed": {"embedding": (jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.hidden_size), jnp.float32) * 0.02
        ).astype(dtype)},
        "layers": [init_layer(cfg, ks[i + 1], dtype, layer_idx=i)
                   for i in range(cfg.num_layers)],
        "final_norm": _norm_params(cfg, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": (jax.random.normal(
            ks[-1], (cfg.vocab_size, cfg.hidden_size), jnp.float32) * 0.02
        ).astype(dtype)}
        if cfg.lm_head_bias:
            params["lm_head"]["bias"] = jnp.zeros((cfg.vocab_size,), dtype)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    # [B, KH, S, D] row-major puts each (batch, kv-head) history in one
    # contiguous HBM run — the flash-decode kernel (ops/decode_attention.py)
    # then streams it with full-bandwidth DMAs instead of KH-strided reads.
    k: jnp.ndarray        # [L, B, KH, S_max, Dh] (bf16/fp32 or int8)
    v: jnp.ndarray        # [L, B, KH, S_max, Dh]
    segment: jnp.ndarray  # [B, S_max] int32 (0 = empty/pad)
    length: jnp.ndarray   # scalar int32: filled prefix length
    # int8 mode only: per-(position, head) dequantization scales
    k_scale: Optional[jnp.ndarray] = None  # [L, B, KH, S_max]
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def constrain_cache(cache: KVCache) -> KVCache:
    """Pin the KV cache's sharding under an ambient mesh: batch over
    (data, fsdp), everything else replicated.

    Without this, GSPMD's sharding inference inside the decode scan can
    pick pathological layouts for the cache carry (e.g. LAYER-dim sharded
    over data — seen as "Involuntary full rematerialization" warnings on
    the round-2 multichip dryrun's decode loop).  No-op when no mesh (the
    single-chip serving path)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return cache
    from jax.sharding import PartitionSpec as P

    batch_axes = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)
    if not batch_axes:
        return cache
    import numpy as _np

    n_shards = int(_np.prod([mesh.shape[a] for a in batch_axes]))
    wsc = jax.lax.with_sharding_constraint

    def c(x, batch_dim, ndim):
        if x is None:
            return None
        dims = [None] * ndim
        if x.shape[batch_dim] % n_shards == 0:
            dims[batch_dim] = batch_axes
        return wsc(x, P(*dims))

    return KVCache(
        c(cache.k, 1, 5), c(cache.v, 1, 5), c(cache.segment, 0, 2),
        cache.length, c(cache.k_scale, 1, 4), c(cache.v_scale, 1, 4))


def init_cache(cfg: DecoderConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> KVCache:
    """dtype: jnp dtype, or the string 'int8' for a quantized cache
    (per-position/head symmetric scales — the TPU answer to the reference's
    optional quantized-KV CUDA kernel, qwen/cpp_kernels.py:39-55 /
    modeling_qwen.py:308: halves KV HBM footprint and read bandwidth)."""
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    if dtype == "int8" or dtype == jnp.int8:
        return KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros((batch, max_len), jnp.int32),
                       jnp.zeros((), jnp.int32),
                       jnp.zeros(shape[:-1], jnp.float32),
                       jnp.zeros(shape[:-1], jnp.float32))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((batch, max_len), jnp.int32),
                   jnp.zeros((), jnp.int32))


def _quantize_kv(x: jnp.ndarray):
    """[..., Dh] -> (int8 values, [...] per-row scales)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


class DecoderOutput(NamedTuple):
    hidden: jnp.ndarray                  # [B, T, D] final-norm output
    aux_loss: jnp.ndarray                # scalar: sum of MoE aux losses
    moe_losses: Tuple[jnp.ndarray, ...]  # per-MoE-layer aux values
    router_probs: Tuple[jnp.ndarray, ...]  # per-MoE-layer [B*T, E] gate probs
    cache: Optional[KVCache]


def _norm(cfg: DecoderConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.norm == "layernorm":
        return layer_norm(x, p["weight"], p.get("bias"), cfg.layernorm_eps)
    return rms_norm(x, p["weight"], cfg.rms_norm_eps, offset=cfg.norm_offset)


def _activation(cfg: DecoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.activation == "silu":
        return jax.nn.silu(x)
    if cfg.activation == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if cfg.activation == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(cfg.activation)


# --- int8 W8A8 matmuls with straight-through backward ----------------------
# The int8 dicts were originally forward-only (frozen teacher inference),
# but a quantized STUDENT body trains too (router-only flagship recipe:
# every non-router weight is frozen, so W8A8 halves its weight reads and
# doubles its MXU peak — while the router's gradient still needs dL/dx
# through every quantized matmul).  jnp.round's zero gradient would kill
# that path, so each int8 matmul is a custom_vjp whose backward is the
# straight-through estimate dL/dx = g @ W_deq^T — itself run on the int8
# MXU (g rows dynamically quantized exactly like forward activations, the
# same estimate ops/losses.py uses for the int8 student LM head).  The
# frozen int8 weights get float0 cotangents (train/steps._grad_fn
# value_and_grad(allow_int=True) turns those into scalar zeros).

def _act_quant_rows(x: jnp.ndarray):
    """Dynamic symmetric per-row (last-axis) int8 activation quantization."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(s / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                 -127, 127).astype(jnp.int8)
    return q, s


def _float0(a):
    import numpy as _np

    return _np.zeros(a.shape, jax.dtypes.float0)


def _dense_int8_impl(x, w_int8, scale):
    xq, s_x = _act_quant_rows(x)
    y = jax.lax.dot_general(xq, w_int8, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * s_x
            * scale.astype(jnp.float32)).astype(x.dtype)


@jax.custom_vjp
def dense_int8(x: jnp.ndarray, w_int8: jnp.ndarray,
               scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8 x @ W: x [..., in] @ {w_int8 [in, out], scale [out]}."""
    return _dense_int8_impl(x, w_int8, scale)


def _dense_int8_fwd(x, w_int8, scale):
    return _dense_int8_impl(x, w_int8, scale), (w_int8, scale)


def _dense_int8_bwd(res, g):
    w_int8, scale = res
    gs = g.astype(jnp.float32) * scale.astype(jnp.float32)
    gq, s_g = _act_quant_rows(gs)
    dx = jax.lax.dot_general(gq, w_int8, (((g.ndim - 1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    dx = (dx.astype(jnp.float32) * s_g).astype(g.dtype)
    return dx, _float0(w_int8), jnp.zeros_like(scale)


dense_int8.defvjp(_dense_int8_fwd, _dense_int8_bwd)


def dense(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w where w is a plain array OR an int8-quantized dict
    {'w_int8': [in, out] int8, 'scale': [out] fp32}.

    Quantized path: dynamic per-row symmetric activation quantization, int8
    MXU matmul (2x bf16 peak on v5e), fp32 rescale; backward is the
    straight-through dL/dx (dense_int8) so frozen-quantized bodies still
    pass gradients to trainable params upstream (e.g. the MoE router).
    """
    if isinstance(w, dict) and "w_int8" in w:
        return dense_int8(x, w["w_int8"], w["scale"])
    return x @ w


def quantize_dense_int8(w: jnp.ndarray):
    """[in, out] float -> {'w_int8', 'scale'} with per-output-channel scales."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return {"w_int8": q, "scale": scale.astype(jnp.float32)}


_QUANT_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_head_int8(w: jnp.ndarray):
    """[V, D] head/embedding-layout weight -> {'w_int8' [V, D],
    'scale' [V]} with per-vocab-row symmetric scales (the layout the
    vocab-chunked losses stream, ops/losses._prep_head_stream)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[:, None]),
                 -127, 127).astype(jnp.int8)
    return {"w_int8": q, "scale": scale.astype(jnp.float32)}


def quantize_experts_int8(experts: Params) -> Params:
    """Stacked expert weights {name: [E, in, out]} -> int8 dicts with
    per-(expert, output-channel) scales, consumed by _expert_mlp on the
    int8 MXU (W8A8 serving of the sparse student)."""
    out = {}
    for name, w in experts.items():
        wf = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=1)            # [E, out]
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(wf / scale[:, None, :]),
                     -127, 127).astype(jnp.int8)
        out[name] = {"w_int8": q, "scale": scale}
    return out


def quantize_decoder_int8(params: Params,
                          include_lm_head: bool = False,
                          include_experts: bool = False,
                          include_embed: bool = False,
                          include_mlp: bool = True,
                          fuse: bool = True) -> Params:
    """Quantize every layer's attention/MLP weights to int8 (embed and norms
    stay float).  include_lm_head additionally quantizes the output head —
    per-vocab-row scales, consumed on the int8 MXU by the chunked KD losses
    and logits_from_hidden; for tied-embedding models an int8 COPY is added
    under 'lm_head' (the float embedding stays for input lookup) which
    lm_head_weight then prefers.  include_experts quantizes the stacked MoE
    expert FFNs too (W8A8 serving of the sparse student — experts are half
    the student's weight bytes; the dense-teacher use leaves them off).
    include_mlp=False quantizes ONLY the attention projections — the
    selective mode for the record train set (dense2sparse_distillation.sh
    trains every FFN + router while attention/embeddings/head stay frozen:
    the frozen attention joins the int8 MXU, the trainable FFNs stay
    float).

    fuse=True (default) concatenates the projections that share an input
    into ONE int8 matmul each: wq|wk|wv -> 'wqkv' [D, (H+2KH)*dh] and
    gate|up -> 'gate_up' [D, 2F].  Forward numerics are BIT-IDENTICAL to
    the unfused layout (the shared input is quantized once with the same
    per-row scales either way, and weight scales are per-output-channel,
    so they concatenate exactly); the win is 1 activation quantization
    instead of 3 (qkv) / 2 (gate-up) and one wide MXU matmul instead of
    several — and the straight-through backward dL/dx collapses to one
    wide int8 matmul too (with one shared cotangent scale per row instead
    of one per projection, a granularity change inside the STE estimate).
    attention_forward / mlp_forward consume either layout."""
    out = dict(params)
    if include_lm_head:
        w = lm_head_weight(params, None)
        out["lm_head"] = {"weight": quantize_head_int8(w)}
        if "lm_head" in params and "bias" in params["lm_head"]:
            out["lm_head"]["bias"] = params["lm_head"]["bias"]
    if include_embed:
        # int8 embedding table (per-row scales, decoder.embed dequantizes on
        # gather).  For tied models with include_lm_head, the int8 head copy
        # above already carries the same values — the float table is the one
        # to drop, so both flags together halve it once.
        w_e = params["embed"]["embedding"]
        out["embed"] = {"embedding": {
            **quantize_head_int8(w_e),
            "dtype_ref": jnp.zeros((0,), w_e.dtype)}}
    layers = []
    for layer in params["layers"]:
        layer = dict(layer)
        attn = dict(layer["attn"])
        if (fuse and "wqkv" not in attn
                and all(k in attn and not isinstance(attn[k], dict)
                        for k in ("wq", "wk", "wv"))):
            attn["wqkv"] = quantize_dense_int8(jnp.concatenate(
                [attn.pop("wq"), attn.pop("wk"), attn.pop("wv")], axis=1))
        else:
            # idempotent: skip keys already fused away or already int8
            for k in ("wq", "wk", "wv"):
                if k in attn and not isinstance(attn[k], dict):
                    attn[k] = quantize_dense_int8(attn[k])
        if not isinstance(attn["wo"], dict):
            attn["wo"] = quantize_dense_int8(attn["wo"])
        layer["attn"] = attn
        mlp = dict(layer["mlp"])
        if include_mlp:
            if (fuse and "gate" in mlp
                    and not isinstance(mlp["gate"], dict)
                    and not isinstance(mlp["up"], dict)
                    and mlp["gate"].shape == mlp["up"].shape):
                mlp["gate_up"] = quantize_dense_int8(jnp.concatenate(
                    [mlp.pop("gate"), mlp.pop("up")], axis=1))
            for k in ("gate", "up", "down"):
                if k in mlp and not isinstance(mlp[k], dict):
                    mlp[k] = quantize_dense_int8(mlp[k])
        if include_experts:
            if "residual_mlp" in mlp:
                mlp["residual_mlp"] = {
                    k: quantize_dense_int8(v) if k in ("gate", "up", "down")
                    else v for k, v in mlp["residual_mlp"].items()}
            if "experts" in mlp and not any(
                    isinstance(v, dict) for v in mlp["experts"].values()):
                mlp["experts"] = quantize_experts_int8(mlp["experts"])
        layer["mlp"] = mlp
        layers.append(layer)
    out["layers"] = layers
    return out


def mlp_forward(cfg: DecoderConfig, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "gate_up" in p:
        # fused frozen-int8 gate|up (quantize_decoder_int8 fuse=True)
        gu = dense(x, p["gate_up"])
        f = gu.shape[-1] // 2
        up = gu[..., f:]
        if cfg.mlp_bias:
            up = up + p["up_bias"]
        h = _activation(cfg, gu[..., :f]) * up
    else:
        up = dense(x, p["up"])
        if cfg.mlp_bias:
            up = up + p["up_bias"]
        if cfg.gated_mlp:
            h = _activation(cfg, dense(x, p["gate"])) * up
        else:
            h = _activation(cfg, up)
    out = dense(h, p["down"])
    if cfg.mlp_bias:
        out = out + p["down_bias"]
    return out


def _expert_dense(xe: jnp.ndarray, w) -> jnp.ndarray:
    """Batched per-expert matmul: xe [E, C, D] @ w [E, D, F] -> [E, C, F].

    w may be a plain array or an int8 dict {'w_int8' [E, D, F],
    'scale' [E, F]} (quantize_experts_int8): dynamic per-row activation
    quantization + batched int8 MXU dot (2x bf16 peak, half the HBM reads
    — the experts are half of a sparse student's weight bytes)."""
    if isinstance(w, dict) and "w_int8" in w:
        return expert_dense_int8(xe, w["w_int8"], w["scale"])
    return jnp.einsum("ecd,edf->ecf", xe, w)


def _expert_dense_int8_impl(xe, w_int8, scale):
    xq, s_x = _act_quant_rows(xe)
    y = jax.lax.dot_general(xq, w_int8, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * s_x
            * scale.astype(jnp.float32)[:, None, :]).astype(xe.dtype)


@jax.custom_vjp
def expert_dense_int8(xe: jnp.ndarray, w_int8: jnp.ndarray,
                      scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8 batched per-expert matmul: xe [E, C, D] @ {w_int8 [E, D, F],
    scale [E, F]} with straight-through dL/dx (see dense_int8)."""
    return _expert_dense_int8_impl(xe, w_int8, scale)


def _expert_dense_int8_fwd(xe, w_int8, scale):
    return _expert_dense_int8_impl(xe, w_int8, scale), (w_int8, scale)


def _expert_dense_int8_bwd(res, g):
    w_int8, scale = res
    gs = g.astype(jnp.float32) * scale.astype(jnp.float32)[:, None, :]
    gq, s_g = _act_quant_rows(gs)
    dx = jax.lax.dot_general(gq, w_int8, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    dx = (dx.astype(jnp.float32) * s_g).astype(g.dtype)
    return dx, _float0(w_int8), jnp.zeros_like(scale)


expert_dense_int8.defvjp(_expert_dense_int8_fwd, _expert_dense_int8_bwd)


def _expert_mlp(cfg: DecoderConfig, experts: Params, xe: jnp.ndarray) -> jnp.ndarray:
    """xe: [E, C, D] -> [E, C, D]; expert weights carry a leading E axis."""
    up = _expert_dense(xe, experts["up"])
    if cfg.gated_mlp:
        gate = _expert_dense(xe, experts["gate"])
        h = _activation(cfg, gate) * up
    else:
        h = _activation(cfg, up)
    return _expert_dense(h, experts["down"])


def _ragged_dense(xr: jnp.ndarray, w, group_sizes: jnp.ndarray) -> jnp.ndarray:
    """Ragged per-expert matmul: xr [M, D] (rows grouped by expert,
    group_sizes [E]) @ w [E, D, F] -> [M, F].  Only the sum(group_sizes)
    kept rows are useful — 1/capacity_factor of the padded [E, C, D] work."""
    if isinstance(w, dict) and "w_int8" in w:
        return ragged_dense_int8(xr, w["w_int8"], w["scale"], group_sizes)
    return jax.lax.ragged_dot(xr, w, group_sizes,
                              preferred_element_type=xr.dtype)


def _row_expert_map(group_sizes: jnp.ndarray, e: int, m: int) -> jnp.ndarray:
    """row index -> expert id for the expert-major ragged row layout."""
    ends = jnp.cumsum(group_sizes)
    row_expert = jnp.searchsorted(ends, jnp.arange(m, dtype=jnp.int32),
                                  side="right")
    return jnp.minimum(row_expert, e - 1).astype(jnp.int32)


def _ragged_dense_int8_impl(xr, w_int8, scale, group_sizes):
    # W8A8 on the ragged layout: per-row dynamic activation scales; the
    # per-expert weight column scales are gathered per row via the
    # row -> expert map implied by group_sizes.
    row_expert = _row_expert_map(group_sizes, w_int8.shape[0], xr.shape[0])
    xq, s_x = _act_quant_rows(xr)
    y = jax.lax.ragged_dot(xq, w_int8, group_sizes,
                           preferred_element_type=jnp.int32)
    s_w = jnp.take(scale.astype(jnp.float32), row_expert, axis=0)
    return (y.astype(jnp.float32) * s_x * s_w).astype(xr.dtype)


@jax.custom_vjp
def ragged_dense_int8(xr: jnp.ndarray, w_int8: jnp.ndarray,
                      scale: jnp.ndarray,
                      group_sizes: jnp.ndarray) -> jnp.ndarray:
    """W8A8 ragged per-expert matmul: xr [M, D] @ {w_int8 [E, D, F],
    scale [E, F]} grouped by group_sizes, straight-through dL/dx."""
    return _ragged_dense_int8_impl(xr, w_int8, scale, group_sizes)


def _ragged_dense_int8_fwd(xr, w_int8, scale, group_sizes):
    return (_ragged_dense_int8_impl(xr, w_int8, scale, group_sizes),
            (w_int8, scale, group_sizes))


def _ragged_dense_int8_bwd(res, g):
    w_int8, scale, group_sizes = res
    row_expert = _row_expert_map(group_sizes, w_int8.shape[0], g.shape[0])
    s_w = jnp.take(scale.astype(jnp.float32), row_expert, axis=0)
    gq, s_g = _act_quant_rows(g.astype(jnp.float32) * s_w)
    dx = jax.lax.ragged_dot(gq, jnp.swapaxes(w_int8, 1, 2), group_sizes,
                            preferred_element_type=jnp.int32)
    dx = (dx.astype(jnp.float32) * s_g).astype(g.dtype)
    return dx, _float0(w_int8), jnp.zeros_like(scale), _float0(group_sizes)


ragged_dense_int8.defvjp(_ragged_dense_int8_fwd, _ragged_dense_int8_bwd)


def _expert_mlp_ragged(cfg: DecoderConfig, experts: Params, xr: jnp.ndarray,
                       group_sizes: jnp.ndarray) -> jnp.ndarray:
    """Ragged-layout expert FFN: xr [M, D] -> [M, D] (see moe_ffn_ragged)."""
    up = _ragged_dense(xr, experts["up"], group_sizes)
    if cfg.gated_mlp:
        gate = _ragged_dense(xr, experts["gate"], group_sizes)
        h = _activation(cfg, gate) * up
    else:
        h = _activation(cfg, up)
    return _ragged_dense(h, experts["down"], group_sizes)


def _grouped_moe(cfg: DecoderConfig, gcfg, xs, router_logits, tv, train,
                 expert_fn, group: int):
    """Gate fixed-size token groups independently (linear dispatch cost;
    matches DeepSpeed's per-rank gating).  Returns (y, aux, probs)."""
    s, d = xs.shape
    e = cfg.moe_num_experts
    g = s // group
    xg = xs.reshape(g, group, d)
    lg = router_logits.reshape(g, group, e)
    tvg = (tv.reshape(g, group) if tv is not None
           else jnp.ones((g, group), bool))
    gate = jax.vmap(
        lambda lgi, tvi: top_k_gating(lgi, gcfg, train=train, token_valid=tvi)
    )(lg, tvg)
    c = gate.dispatch.shape[-1]
    xe = jnp.einsum("gsec,gsd->gecd", gate.dispatch.astype(xs.dtype), xg)
    xe = xe.transpose(1, 0, 2, 3).reshape(e, g * c, d)
    ye = expert_fn(xe)
    ye = ye.reshape(e, g, c, d).transpose(1, 0, 2, 3)
    y = jnp.einsum("gsec,gecd->gsd", gate.combine.astype(ye.dtype), ye)
    return (y.reshape(s, d), jnp.mean(gate.aux_loss),
            gate.router_probs.reshape(s, e))


def moe_block_forward(cfg: DecoderConfig, p: Params, x: jnp.ndarray,
                      train: bool, token_valid: Optional[jnp.ndarray]):
    """Sparse FFN: x [B, T, D] -> (y, aux_loss, router_probs)."""
    b, t, d = x.shape
    xs = x.reshape(b * t, d)
    gcfg = GatingConfig(
        num_experts=cfg.moe_num_experts, top_k=cfg.moe_top_k,
        capacity_factor=cfg.moe_capacity_factor,
        eval_capacity_factor=cfg.moe_eval_capacity_factor,
        min_capacity=cfg.moe_min_capacity)
    router_logits = xs.astype(jnp.float32) @ p["router"].astype(jnp.float32)
    tv = token_valid.reshape(b * t) if token_valid is not None else None
    expert_fn = functools.partial(_expert_mlp, cfg, p["experts"])
    expert_fn_ragged = functools.partial(_expert_mlp_ragged, cfg, p["experts"])
    gather = cfg.moe_dispatch in ("gather", "ragged")
    ragged = cfg.moe_dispatch == "ragged"
    group = cfg.moe_gating_group_size
    pad = 0
    if group and b * t > group and (b * t) % group != 0:
        # Pad to a group multiple with invalid tokens rather than silently
        # falling back to global gating (whose dispatch is quadratic in
        # tokens — a measured 0.53 -> 0.33 MFU cliff at B=8).  Padded rows
        # carry token_valid=False so the gate never routes them; their
        # expert outputs are sliced away below.
        pad = -(b * t) % group
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        router_logits = jnp.pad(router_logits, ((0, pad), (0, 0)))
        tv = jnp.pad(tv if tv is not None else jnp.ones((b * t,), bool),
                     (0, pad))
    if group and b * t > group:
        s = xs.shape[0]  # b*t rounded up to a group multiple
        if gather:
            e = cfg.moe_num_experts
            g = s // group
            lg = router_logits.reshape(g, group, e)
            tvg = (tv.reshape(g, group) if tv is not None
                   else jnp.ones((g, group), bool))
            comp = jax.vmap(lambda l, v: top_k_gating_compact(
                l, gcfg, train=train, token_valid=v))(lg, tvg)
            if ragged:
                y = moe_ffn_ragged_grouped(
                    xs, comp, e, gcfg.capacity(group, train), group,
                    expert_fn_ragged)
            else:
                y = moe_ffn_gather_grouped(
                    xs, comp, e, gcfg.capacity(group, train), group,
                    expert_fn)
            aux = jnp.mean(comp.aux_loss)
            probs = comp.router_probs.reshape(s, e)
        else:
            y, aux, probs = _grouped_moe(cfg, gcfg, xs, router_logits, tv,
                                         train, expert_fn, group)
        if pad:
            y, probs, xs = y[:b * t], probs[:b * t], xs[:b * t]
        if cfg.moe_use_residual:
            res = mlp_forward(cfg, p["residual_mlp"], xs)
            coef = jax.nn.softmax((xs @ p["coef"]).astype(jnp.float32), axis=-1)
            y = y * coef[:, :1].astype(y.dtype) + res * coef[:, 1:].astype(res.dtype)
        return y.reshape(b, t, d), aux, probs
    if gather:
        comp = top_k_gating_compact(router_logits, gcfg, train=train,
                                    token_valid=tv)
        if ragged:
            y = moe_ffn_ragged(xs, comp, cfg.moe_num_experts,
                               gcfg.capacity(b * t, train), expert_fn_ragged)
        else:
            y = moe_ffn_gather(xs, comp, cfg.moe_num_experts,
                               gcfg.capacity(b * t, train), expert_fn)
        aux, probs = comp.aux_loss, comp.router_probs
    else:
        gate = top_k_gating(router_logits, gcfg, train=train, token_valid=tv)
        y = moe_ffn(xs, gate.dispatch, gate.combine, expert_fn)
        aux, probs = gate.aux_loss, gate.router_probs
    if cfg.moe_use_residual:
        res = mlp_forward(cfg, p["residual_mlp"], xs)
        coef = jax.nn.softmax((xs @ p["coef"]).astype(jnp.float32), axis=-1)
        y = y * coef[:, :1].astype(y.dtype) + res * coef[:, 1:].astype(res.dtype)
    return y.reshape(b, t, d), aux, probs


# Selective remat: recompute ONLY the sparse-FFN block in the backward
# (gating + dispatch + expert matmuls), keeping attention/norm activations
# resident.  The expert intermediates are the dominant activation cost
# (E*C = capacity_factor*k*S rows of [*, F] per MoE layer); this frees
# ~85% of their memory for ~+1 expert-forward of recompute.  Enabled via
# DecoderConfig.remat_policy == 'moe' (independent of full-layer remat).
_moe_block_rematted = jax.checkpoint(moe_block_forward,
                                     static_argnums=(0, 3))


def _alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Standard ALiBi head slopes (geometric 2^(-8i/H), press et al.)."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        slopes = pow2_slopes(num_heads)
    else:
        closest = 2 ** math.floor(math.log2(num_heads))
        slopes = pow2_slopes(closest) + pow2_slopes(2 * closest)[0::2][
            : num_heads - closest]
    return jnp.asarray(slopes, jnp.float32)


def _alibi_bias(cfg: DecoderConfig, q_pos: jnp.ndarray,
                kv_pos: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, S] additive bias: -slope * (q_pos - kv_pos) (MPT attention;
    reference mpt/attention.py build_alibi_bias semantics)."""
    slopes = _alibi_slopes(cfg.num_heads)  # [H]
    dist = (q_pos[:, :, None] - kv_pos[:, None, :]).astype(jnp.float32)
    dist = jnp.maximum(dist, 0.0)  # future positions are masked anyway
    return -slopes[None, :, None, None] * dist[:, None]


def attention_forward(cfg: DecoderConfig, p: Params, x: jnp.ndarray,
                      positions: jnp.ndarray,
                      segment_ids: Optional[jnp.ndarray],
                      layer_idx: int,
                      cache: Optional[KVCache],
                      attn_impl: str = "auto",
                      cache_rows=None,
                      prefix_mask: Optional[jnp.ndarray] = None):
    """x: [B, T, D].  Returns (out [B, T, D], updated (k,v,segment) or None).

    cache_rows: optional (k, v, k_scale, v_scale) per-layer cache arrays
    overriding cache.k[layer_idx]/... — used by the scanned decode path,
    where the layer axis is a lax.scan input instead of a Python index.
    """
    b, t, d = x.shape
    h, kh, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    if "wqkv" in p:
        # fused frozen-int8 projection (quantize_decoder_int8 fuse=True):
        # one activation quantization + one wide MXU matmul for q|k|v
        qkv = dense(x, p["wqkv"])
        q = qkv[..., :h * dh]
        k = qkv[..., h * dh:(h + kh) * dh]
        v = qkv[..., (h + kh) * dh:]
    else:
        q = dense(x, p["wq"])
        k = dense(x, p["wk"])
        v = dense(x, p["wv"])
    if cfg.qkv_bias:
        q, k, v = q + p["bq"], k + p["bk"], v + p["bv"]
    q = q.reshape(b, t, h, dh)
    k = k.reshape(b, t, kh, dh)
    v = v.reshape(b, t, kh, dh)

    if cfg.use_rope:
        theta = cfg.rope_theta
        if cfg.use_dynamic_ntk:
            # NTK-aware base rescale once the context exceeds the training
            # length (modeling_qwen.py:286-298): alpha = 2^ceil(log2(L/L0)+1)
            # - 1 clamped to >= 1, base *= alpha^(r/(r-2)).  Identity for
            # L <= L0, so safe to leave on during training.
            rdim = cfg.rotary_dim
            true_len = jnp.max(positions).astype(jnp.float32) + 1.0
            ctx = jnp.ceil(jnp.log2(true_len / cfg.rope_seq_length) + 1.0)
            alpha = jnp.maximum(2.0 ** ctx - 1.0, 1.0)
            theta = cfg.rope_theta * alpha ** (rdim / (rdim - 2))
        cos, sin = rope_table(positions, dh, theta, cfg.rotary_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cfg.use_logn_attn:
            # logn query scaling (modeling_qwen.py:481-491): at absolute
            # position p the query is scaled by log_{L0}(p+1), clamped >= 1.
            npos = positions.astype(jnp.float32) + 1.0
            logn = jnp.maximum(
                jnp.log(npos) / jnp.log(float(cfg.rope_seq_length)), 1.0)
            q = (q.astype(jnp.float32) * logn[..., None, None]).astype(q.dtype)

    scale = (cfg.query_pre_attn_scalar ** -0.5 if cfg.query_pre_attn_scalar
             else dh ** -0.5)
    softcap = cfg.attn_logit_softcap

    # With a pattern of p, the LAST layer of each period is global and the
    # rest slide — gemma2 slides on even layers (p=2; reference
    # modeling_gemma2.py:246 `if not bool(layer_idx % 2)`); p=1 = all sliding
    # (mistral).
    pat = cfg.sliding_window_pattern
    sliding = cfg.sliding_window if (
        cfg.sliding_window and (pat == 1 or layer_idx % pat != pat - 1)
    ) else None

    # attn_impl == "fresh" asserts the cache was EMPTY before this call (a
    # full prefill): attention then runs on the chunk's own K/V through the
    # flash kernel (no [T, S_max] cache-wide mask materializes), while the
    # cache is still written for the decode steps that follow.
    fresh = attn_impl == "fresh"
    chunk_attn = cache is None or (fresh and t > 1)
    new_kv = None
    if cache is not None:
        # Decode / incremental prefill: write k,v into the cache at `length`.
        # Cache layout is [B, KH, S, D] (head-major) — see KVCache.
        start = cache.length
        scales = None
        k_bh = jnp.swapaxes(k, 1, 2)  # [B, KH, t, D]
        v_bh = jnp.swapaxes(v, 1, 2)
        if cache_rows is not None:
            base_k, base_v, base_ks, base_vs = cache_rows
        else:
            base_k, base_v = cache.k[layer_idx], cache.v[layer_idx]
            base_ks = cache.k_scale[layer_idx] if cache.quantized else None
            base_vs = cache.v_scale[layer_idx] if cache.quantized else None
        if cache.quantized:
            kq, ks = _quantize_kv(k_bh)
            vq, vs = _quantize_kv(v_bh)
            ck = jax.lax.dynamic_update_slice(base_k, kq, (0, 0, start, 0))
            cv = jax.lax.dynamic_update_slice(base_v, vq, (0, 0, start, 0))
            cks = jax.lax.dynamic_update_slice(base_ks, ks, (0, 0, start))
            cvs = jax.lax.dynamic_update_slice(base_vs, vs, (0, 0, start))
            scales = (cks, cvs)
        else:
            ck = jax.lax.dynamic_update_slice(
                base_k, k_bh.astype(cache.k.dtype), (0, 0, start, 0))
            cv = jax.lax.dynamic_update_slice(
                base_v, v_bh.astype(cache.v.dtype), (0, 0, start, 0))
        s_max = ck.shape[2]
        if segment_ids is not None:
            cseg = jax.lax.dynamic_update_slice(cache.segment,
                                                segment_ids.astype(jnp.int32),
                                                (0, start))
        else:
            cseg = jax.lax.dynamic_update_slice(
                cache.segment, jnp.ones((b, t), jnp.int32), (0, start))
        new_kv = (ck, cv, cseg, scales)

        use_kernel = (t == 1 and sliding is None and not cfg.alibi
                      and os.environ.get("LLAVAMOD_DECODE_ATTN", "") != "xla")
        if chunk_attn:
            pass  # attention computed below on the fresh chunk K/V
        elif use_kernel:
            # Single-token decode: Pallas flash-decode streams the cache in
            # its stored dtype (int8 stays int8 until the VMEM registers).
            # Causality needs no position mask — slots past `start` are
            # still segment-0 (init_cache zero-fills).
            out = flash_decode(
                q[:, 0], ck, cv, kv_seg=cseg,
                k_scale=scales[0] if scales else None,
                v_scale=scales[1] if scales else None,
                scale=scale, softcap=softcap)[:, None]
        else:
            if cache.quantized:
                k_full = _dequantize_kv(ck, cks, q.dtype)
                v_full = _dequantize_kv(cv, cvs, q.dtype)
            else:
                k_full = ck.astype(q.dtype)
                v_full = cv.astype(q.dtype)
            # Mask: causal against absolute positions + valid segment.
            kv_pos = jnp.arange(s_max)[None, None, None, :]
            q_pos = (start + jnp.arange(t))[None, None, :, None]
            mask = kv_pos <= q_pos
            mask = mask & (cseg[:, None, None, :] != 0)
            if sliding is not None:
                mask = mask & (kv_pos > q_pos - sliding)
            bias = None
            if cfg.alibi:
                bias = _alibi_bias(cfg, jnp.broadcast_to(
                    start + jnp.arange(t)[None, :], (b, t)),
                    jnp.broadcast_to(jnp.arange(s_max)[None, :], (b, s_max)))
            out = dot_product_attention(
                q, k_full, v_full, mask=mask, bias=bias,
                causal=False, scale=scale, softcap=softcap, impl="xla",
                kv_layout="bksd")
    if chunk_attn:
        mask = None
        segs = None
        if segment_ids is not None:
            segs = (segment_ids, segment_ids)
        bias = _alibi_bias(cfg, positions, positions) if cfg.alibi else None
        if prefix_mask is not None:
            # Prefix-LM attention (the TPU-native form of the reference's
            # MPT hf_prefixlm_converter.py: its `bidirectional_mask` lets
            # every position attend to any PREFIX position, so the prefix
            # is encoded bidirectionally while the suffix stays causal):
            # allowed(q, k) = causal(q, k) OR prefix[k].
            q_pos = positions[:, None, :, None]
            kv_pos = positions[:, None, None, :]
            mask = (kv_pos <= q_pos) | prefix_mask[:, None, None, :]
            if segment_ids is not None:
                seg_q = segment_ids[:, None, :, None]
                seg_k = segment_ids[:, None, None, :]
                mask = mask & (seg_q == seg_k) & (seg_k != 0)
                segs = None
            if sliding is not None:
                mask = mask & (kv_pos > q_pos - sliding)
            out = dot_product_attention(q, k, v, mask=mask, bias=bias,
                                        causal=False, scale=scale,
                                        softcap=softcap, impl="xla")
        elif sliding is not None:
            q_pos = positions[:, None, :, None] if positions.ndim == 2 else (
                jnp.arange(t)[None, None, :, None])
            kv_pos = q_pos.swapaxes(-1, -2)
            mask = kv_pos > q_pos - sliding
            # window masks force the XLA path for now
            out = dot_product_attention(q, k, v, mask=mask, bias=bias,
                                        causal=True,
                                        scale=scale, softcap=softcap,
                                        segment_ids=segs, impl="xla")
        else:
            # ALiBi carries a dense bias -> XLA path (flash takes no bias)
            impl = "auto" if attn_impl == "fresh" else attn_impl
            out = dot_product_attention(q, k, v, bias=bias, causal=True,
                                        scale=scale, softcap=softcap,
                                        segment_ids=segs,
                                        impl="xla" if bias is not None
                                        else impl)

    out = dense(out.reshape(b, t, h * dh), p["wo"])
    if cfg.o_bias:
        out = out + p["bo"]
    return out, new_kv


def layer_forward(cfg: DecoderConfig, p: Params, x: jnp.ndarray,
                  positions, segment_ids, layer_idx, cache,
                  train: bool, attn_impl: str = "auto", cache_rows=None,
                  prefix_mask: Optional[jnp.ndarray] = None):
    is_moe_layer = cfg.is_moe and (layer_idx in cfg.moe_layers)
    aux = jnp.zeros((), jnp.float32)
    router_probs = None
    token_valid = (segment_ids != 0) if segment_ids is not None else None
    moe_fwd = (_moe_block_rematted if cfg.remat_policy == "moe"
               else moe_block_forward)

    normed = _norm(cfg, p["input_norm"], x)
    attn_out, new_kv = attention_forward(cfg, p["attn"], normed, positions,
                                         segment_ids, layer_idx, cache,
                                         attn_impl, cache_rows,
                                         prefix_mask=prefix_mask)
    if cfg.post_attn_norm:
        attn_out = _norm(cfg, p["post_attn_norm"], attn_out)

    # MiniCPM mup: every sublayer output is scaled by scale_depth/sqrt(L)
    # before the residual add (reference modeling_minicpm.py:818,825).
    rs = cfg.residual_scale

    if cfg.parallel_block:
        if is_moe_layer:
            mlp_out, aux, router_probs = moe_fwd(
                cfg, p["mlp"], normed, train, token_valid)
        else:
            mlp_out = mlp_forward(cfg, p["mlp"], normed)
        if rs is not None:
            attn_out = attn_out * rs
            mlp_out = mlp_out * rs
        x = x + attn_out + mlp_out
    else:
        x = x + (attn_out if rs is None else attn_out * rs)
        normed2 = _norm(cfg, p["post_attn_input_norm"], x)
        if is_moe_layer:
            mlp_out, aux, router_probs = moe_fwd(
                cfg, p["mlp"], normed2, train, token_valid)
        else:
            mlp_out = mlp_forward(cfg, p["mlp"], normed2)
        if cfg.post_mlp_norm:
            mlp_out = _norm(cfg, p["post_mlp_norm"], mlp_out)
        x = x + (mlp_out if rs is None else mlp_out * rs)
    return x, new_kv, aux, router_probs


def _seq_constraint(cfg: DecoderConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Sequence-parallel residual stream: [B, T, D] sharded T-over-'tensor'.

    A pure sharding annotation — GSPMD inserts the all-gather before each
    TP matmul and the reduce-scatter after (Megatron-SP communication
    pattern), cutting norm/residual activation memory by the TP degree.
    No-op unless cfg.seq_shard_activations (trainer-set, requires a mesh)."""
    if not cfg.seq_shard_activations:
        return x
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, P(("data", "fsdp"), "tensor", None))


def _layer_kind(cfg: DecoderConfig, i: int) -> Tuple[bool, int]:
    """Structural signature of layer i: (is_moe, sliding-window phase)."""
    is_moe = cfg.is_moe and (i in cfg.moe_layers)
    phase = i % cfg.sliding_window_pattern if cfg.sliding_window else 0
    return (is_moe, phase)


def _layer_period(cfg: DecoderConfig) -> int:
    """Smallest period p such that layer kinds repeat with period p."""
    kinds = [_layer_kind(cfg, i) for i in range(cfg.num_layers)]
    for p in range(1, cfg.num_layers + 1):
        if cfg.num_layers % p == 0 and all(
                kinds[i] == kinds[i % p] for i in range(cfg.num_layers)):
            return p
    return cfg.num_layers


def _stack_period(layers, p: int):
    """Stack layer param trees position-by-position within the period:
    returns ([tree with leading reps axis] * p, reps)."""
    reps = len(layers) // p
    stacked = []
    for j in range(p):
        group = [layers[r * p + j] for r in range(reps)]
        stacked.append(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *group))
    return stacked, reps


def is_stacked(params: Params) -> bool:
    return isinstance(params["layers"], dict) and "stacked" in params["layers"]


def stack_layers(cfg: DecoderConfig, params: Params) -> Params:
    """Pre-stack the layer trees for the scan path, ONCE, outside the step.

    Without this, the jitted step's lax.scan stacks every layer's weights
    into one HLO temp on EVERY call — a full extra copy of all layer params
    (1.9 GB of per-step HBM traffic for a 1.8B int8 teacher; a fatal 8.4 GB
    peak for a 7B one).  A pre-stacked tree is consumed by the scan
    directly.  Format: params['layers'] = {'stacked': [tree_0..tree_{p-1}]}
    with p = the structural period and each leaf carrying a leading
    num_layers/p axis.  Supported by the scan (no-cache) path only;
    unstack_layers() restores the per-layer list."""
    if is_stacked(params):
        return params
    p = _layer_period(cfg)
    stacked, _ = _stack_period(params["layers"], p)
    out = dict(params)
    out["layers"] = {"stacked": stacked}
    return out


def unstack_layers(cfg: DecoderConfig, params: Params) -> Params:
    """Inverse of stack_layers (e.g. before checkpoint export)."""
    if not is_stacked(params):
        return params
    stacked = params["layers"]["stacked"]
    p = len(stacked)
    reps = jax.tree_util.tree_leaves(stacked[0])[0].shape[0]
    layers = []
    for r in range(reps):
        for j in range(p):
            layers.append(jax.tree_util.tree_map(lambda x: x[r], stacked[j]))
    out = dict(params)
    out["layers"] = layers
    return out


def _scan_layers(params, cfg: DecoderConfig, x, positions, segment_ids,
                 train: bool, attn_impl: str, remat: bool,
                 prefix_mask=None):
    """lax.scan over period-stacked layers (prefill/training path, no cache).

    Layers are grouped into repeats of the structural period (e.g. 2 for the
    'sparse' every-2nd-layer MoE recipe), their params stacked on a leading
    repeat axis, and ONE repeat is traced — compile time drops by ~L/period.
    """
    layers = params["layers"]
    if isinstance(layers, dict) and "stacked" in layers:
        stacked = layers["stacked"]
        p = len(stacked)
    else:
        p = _layer_period(cfg)
        stacked, _ = _stack_period(layers, p)

    from llavamod_tpu.parallel import pipeline

    if pipeline.pipe_size() > 1:
        # GPipe microbatch pipeline over the mesh 'pipe' axis (stages own
        # contiguous repeat blocks).  Router-prob probes (gating dump) are
        # not collected under PP — run non-pipelined to dump gating.
        x, aux_total = pipeline.pipeline_layers(
            cfg, stacked, x, positions, segment_ids, train, attn_impl,
            remat, prefix_mask=prefix_mask)
        return x, aux_total, (), ()

    def block(x, rep_params):
        aux_sum = jnp.zeros((), jnp.float32)
        probs_list = []
        for j in range(p):
            # layer_idx=j is valid: by construction of the period, layer kind
            # (moe membership, sliding phase) at position j is the same for
            # every repeat.
            x, _, aux, probs = layer_forward(
                cfg, rep_params[j],
                x, positions, segment_ids, j, None, train, attn_impl,
                prefix_mask=prefix_mask)
            x = _seq_constraint(cfg, x)
            aux_sum = aux_sum + aux
            if probs is not None:
                probs_list.append(probs)
        probs_out = (jnp.stack(probs_list) if probs_list
                     else jnp.zeros((0, 1, 1), jnp.float32))
        return x, (aux_sum, probs_out)

    if remat:
        policy = None
        if cfg.remat_policy == "dots":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        block = jax.checkpoint(block, policy=policy)

    x, (aux_per_rep, probs_per_rep) = jax.lax.scan(
        block, x, tuple(stacked), unroll=max(1, cfg.scan_unroll))
    aux_total = jnp.sum(aux_per_rep)
    # probs_per_rep: [reps, moe_per_period, S, E] -> tuple per moe layer
    if probs_per_rep.shape[1] > 0:
        flat = probs_per_rep.reshape((-1,) + probs_per_rep.shape[2:])
        router_probs = tuple(flat[i] for i in range(flat.shape[0]))
        moe_losses = tuple(aux_per_rep)  # per-repeat sums
    else:
        router_probs = ()
        moe_losses = ()
    return x, aux_total, moe_losses, router_probs


def _scan_layers_cached(params, cfg: DecoderConfig, x, positions, segment_ids,
                        train: bool, attn_impl: str, cache: KVCache):
    """lax.scan over period-stacked layers for the CACHED (prefill/decode)
    path: per-layer cache rows ride the scan as inputs/outputs, so one
    traced block serves all L layers — ~L/period faster decode compiles
    than the previous inline loop, identical numerics."""
    b, t, _ = x.shape
    layers = params["layers"]
    n = len(layers)
    p = _layer_period(cfg)
    stacked, reps = _stack_period(layers, p)
    quant = cache.quantized

    def resh(a):
        return a.reshape((reps, p) + a.shape[1:])

    xs = (tuple(stacked), resh(cache.k), resh(cache.v),
          resh(cache.k_scale) if quant else None,
          resh(cache.v_scale) if quant else None)

    def block(x, xs_t):
        rep_params, k_r, v_r, ks_r, vs_r = xs_t
        new_k, new_v, new_ks, new_vs = [], [], [], []
        aux_sum = jnp.zeros((), jnp.float32)
        probs_list = []
        seg_out = None
        for j in range(p):
            rows = (k_r[j], v_r[j],
                    ks_r[j] if quant else None,
                    vs_r[j] if quant else None)
            x, kv, aux, probs = layer_forward(
                cfg, rep_params[j], x, positions, segment_ids, j, cache,
                train, attn_impl, cache_rows=rows)
            new_k.append(kv[0])
            new_v.append(kv[1])
            seg_out = kv[2]
            if kv[3] is not None:
                new_ks.append(kv[3][0])
                new_vs.append(kv[3][1])
            aux_sum = aux_sum + aux
            if probs is not None:
                probs_list.append(probs)
        probs_out = (jnp.stack(probs_list) if probs_list
                     else jnp.zeros((0, 1, 1), jnp.float32))
        ys = (jnp.stack(new_k), jnp.stack(new_v),
              jnp.stack(new_ks) if quant else None,
              jnp.stack(new_vs) if quant else None,
              seg_out, aux_sum, probs_out)
        return x, ys

    x, ys = jax.lax.scan(block, x, xs, unroll=max(1, cfg.scan_unroll))
    k_new, v_new, ks_new, vs_new, segs, aux_per_rep, probs_per_rep = ys

    def unresh(a):
        return a.reshape((n,) + a.shape[2:])

    new_cache = KVCache(
        unresh(k_new), unresh(v_new), segs[0], cache.length + t,
        unresh(ks_new) if quant else None,
        unresh(vs_new) if quant else None)

    x = _norm(cfg, params["final_norm"], x)
    aux_total = jnp.sum(aux_per_rep)
    if probs_per_rep.shape[1] > 0:
        flat = probs_per_rep.reshape((-1,) + probs_per_rep.shape[2:])
        router_probs = tuple(flat[i] for i in range(flat.shape[0]))
        moe_losses = tuple(aux_per_rep)
    else:
        router_probs = ()
        moe_losses = ()
    return DecoderOutput(x, aux_total, moe_losses, router_probs, new_cache)


def forward(
    params: Params,
    cfg: DecoderConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    cache: Optional[KVCache] = None,
    train: bool = False,
    attn_impl: str = "auto",
    remat: bool = False,
    prefix_mask: Optional[jnp.ndarray] = None,
) -> DecoderOutput:
    """Run the decoder stack.  Provide input_ids OR inputs_embeds.

    positions: [B, T] absolute positions (defaults to arange, or cache.length
    offset during decode).  segment_ids: [B, T] (0 = padding).
    """
    if inputs_embeds is None:
        inputs_embeds = embed(params, cfg, input_ids)
    b, t, _ = inputs_embeds.shape
    if positions is None:
        base = jnp.arange(t)[None, :]
        if cache is not None:
            base = base + cache.length
        positions = jnp.broadcast_to(base, (b, t))

    x = inputs_embeds
    if cache is None:
        x = _seq_constraint(cfg, x)

    stacked_tree = is_stacked(params)
    if cache is None and cfg.scan_layers and (
            stacked_tree or len(params["layers"]) > 1):
        x, aux_total, moe_losses, router_probs = _scan_layers(
            params, cfg, x, positions, segment_ids, train, attn_impl, remat,
            prefix_mask=prefix_mask)
        x = _norm(cfg, params["final_norm"], x)
        return DecoderOutput(x, aux_total, moe_losses, router_probs, None)

    if stacked_tree:
        raise ValueError(
            "pre-stacked layer trees (stack_layers) support only the "
            "scan_layers no-cache path; unstack_layers() first")

    if (cache is not None and cfg.scan_layers_decode
            and len(params["layers"]) > 1):
        return _scan_layers_cached(params, cfg, x, positions, segment_ids,
                                   train, attn_impl, cache)

    aux_total = jnp.zeros((), jnp.float32)
    moe_losses: List[jnp.ndarray] = []
    router_probs: List[jnp.ndarray] = []
    new_k, new_v, new_seg = [], [], None
    new_ks, new_vs = [], []

    layer_fn = layer_forward
    if remat and cache is None:
        # full per-layer remat: save only layer boundaries, recompute the rest
        layer_fn = jax.checkpoint(
            layer_forward,
            static_argnums=(0, 5, 7, 8))  # cfg, layer_idx, train, attn_impl

    for i, layer_params in enumerate(params["layers"]):
        x, kv, aux, probs = layer_fn(cfg, layer_params, x, positions,
                                     segment_ids, i, cache, train, attn_impl,
                                     None, prefix_mask)
        if cache is None:
            x = _seq_constraint(cfg, x)
        aux_total = aux_total + aux
        if probs is not None:
            moe_losses.append(aux)
            router_probs.append(probs)
        if kv is not None:
            new_k.append(kv[0])
            new_v.append(kv[1])
            new_seg = kv[2]
            if kv[3] is not None:
                new_ks.append(kv[3][0])
                new_vs.append(kv[3][1])

    x = _norm(cfg, params["final_norm"], x)

    new_cache = None
    if cache is not None:
        new_cache = KVCache(
            jnp.stack(new_k), jnp.stack(new_v), new_seg, cache.length + t,
            jnp.stack(new_ks) if new_ks else None,
            jnp.stack(new_vs) if new_vs else None)
    return DecoderOutput(x, aux_total, tuple(moe_losses), tuple(router_probs),
                         new_cache)


def embed(params: Params, cfg: DecoderConfig, input_ids: jnp.ndarray) -> jnp.ndarray:
    w = params["embed"]["embedding"]
    if isinstance(w, dict) and "w_int8" in w:
        # int8 embedding table (quantize_head_int8 layout: per-row scales):
        # gather int8 rows + their scales, dequantize — halves the table's
        # HBM footprint for frozen-embedding recipes.  'dtype_ref' is a
        # zero-size array carrying the original activation dtype.
        rows = jnp.take(w["w_int8"], input_ids, axis=0).astype(jnp.float32)
        scale = jnp.take(w["scale"], input_ids, axis=0)[..., None]
        tgt = w["dtype_ref"].dtype if "dtype_ref" in w else jnp.bfloat16
        e = (rows * scale).astype(tgt)
    else:
        e = jnp.take(w, input_ids, axis=0)
    if cfg.embed_scale is not None:
        e = (e.astype(jnp.float32) * cfg.embed_scale).astype(e.dtype)
    return e


def lm_head_weight(params: Params, cfg: Optional[DecoderConfig] = None):
    """[V, D] output-projection weight (tied embedding or separate head),
    or the int8 dict from quantize_head_int8.  An explicit 'lm_head' entry
    wins even for tied models (that's where the int8 copy lives)."""
    if "lm_head" in params:
        return params["lm_head"]["weight"]
    return params["embed"]["embedding"]


def logits_from_hidden(params: Params, cfg: DecoderConfig,
                       hidden: jnp.ndarray) -> jnp.ndarray:
    w = lm_head_weight(params, cfg)
    if cfg.logit_scale is not None:
        # MiniCPM mup: hidden / (hidden_size/dim_model_base) before the head
        # (reference modeling_minicpm.py:1214)
        hidden = hidden * jnp.asarray(cfg.logit_scale, hidden.dtype)
    if isinstance(w, dict) and "w_int8" in w:
        # int8 head: dynamic per-row activation quant, int8 MXU matmul
        b, t, d = hidden.shape
        h = hidden.reshape(b * t, d).astype(jnp.float32)
        s_h = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0,
                          1e-8)
        hq = jnp.clip(jnp.round(h / s_h), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(hq, w["w_int8"], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        logits = (y.astype(jnp.float32) * s_h
                  * w["scale"].astype(jnp.float32)[None, :])
        logits = logits.reshape(b, t, -1)
    else:
        logits = jnp.einsum("btd,vd->btv", hidden, w,
                            preferred_element_type=jnp.float32)
    if "lm_head" in params and "bias" in params["lm_head"]:
        logits = logits + params["lm_head"]["bias"].astype(logits.dtype)
    if cfg.final_logit_softcap is not None:
        c = cfg.final_logit_softcap
        logits = jnp.tanh(logits / c) * c
    return logits
