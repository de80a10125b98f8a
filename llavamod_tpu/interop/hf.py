"""HF <-> llavamod_tpu weight conversion.

Replaces the reference's checkpoint plumbing (model/builder.py key-prefix
stripping, scripts/extract_mm_projector.py) with explicit converters.
Conventions:
  * our linear weights are [in, out]; torch nn.Linear is [out, in] -> transpose
  * embedding / lm_head stay [V, D]
  * conv patch embedding [D, C, p, p] -> [C*p*p, D]
State dicts may be torch tensors or numpy arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from llavamod_tpu.models.llm.config import DecoderConfig
from llavamod_tpu.models.vision.vit import VisionConfig

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (possibly bf16) without importing torch at module scope
    return np.asarray(x.float().cpu().numpy() if hasattr(x, "cpu") else x,
                      dtype=np.float32)


def _t(x) -> np.ndarray:
    return _np(x).T


# HF model_types whose config + state-dict layout we can convert.  Anything
# else raises a ValueError up front instead of a KeyError mid-conversion.
SUPPORTED_MODEL_TYPES = (
    "qwen2", "llama", "mistral", "minicpm",          # llama-style layouts
    "gemma2", "phi", "stablelm", "stablelm_epoch",   # llama keys, extra flags
    "mpt", "qwen",                                   # fused-qkv layouts
)


def _moe_kwargs_from_hf(hf_config) -> dict:
    """The reference's embedded `moe` config block (llava_qwen1_5_moe.py:48-81)."""
    moe = getattr(hf_config, "moe", None)
    if not (isinstance(moe, dict) and moe.get("moe_enable")):
        return {}
    num_experts = moe.get("num_experts", 4)
    if isinstance(num_experts, (list, tuple)):
        num_experts = num_experts[0]
    return dict(
        moe_num_experts=int(num_experts),
        moe_top_k=int(moe.get("top_k_experts", 2)),
        moe_capacity_factor=float(moe.get("capacity_factor", 1.5)),
        moe_eval_capacity_factor=float(moe.get("eval_capacity_factor", 2.0)),
        moe_min_capacity=int(moe.get("min_capacity", 4)),
        moe_layers=tuple(moe.get("moe_layers_idx") or ()),
        moe_use_residual=bool(moe.get("use_residual", False)),
        router_aux_loss_coef=float(moe.get("router_aux_loss_coef", 0.01)),
    )


def decoder_config_from_hf(hf_config) -> DecoderConfig:
    """Map an HF config to DecoderConfig for every family the reference
    vendors (SURVEY §2.7): qwen2/llama/mistral/minicpm/gemma2/phi/stablelm/
    mpt/qwen-1.0, including the reference's embedded `moe` block
    (llava_qwen1_5_moe.py:48-81)."""
    mt = getattr(hf_config, "model_type", "llama")
    # reference CHECKPOINT model_types (llava_qwen1_5.py:46 etc.) map onto
    # their base modeling layout; qwen1_5 checkpoints use the Qwen2 modeling
    # (reference vendored qwen1_5/modeling_qwen2.py)
    if mt.startswith("moe_llava_"):
        mt = mt[len("moe_llava_"):]
    elif mt.startswith("llava_"):
        mt = mt[len("llava_"):]
    mt = {"qwen1_5": "qwen2"}.get(mt, mt)
    kw = _moe_kwargs_from_hf(hf_config)

    if mt == "mpt":
        # reference mpt/configuration_mpt.py: d_model/n_heads/n_layers,
        # expansion_ratio, attn_config dict; ALiBi, LayerNorm, GELU, no rope.
        attn_cfg = getattr(hf_config, "attn_config", None) or {}
        if hasattr(attn_cfg, "alibi"):          # transformers MptAttentionConfig
            alibi = bool(attn_cfg.alibi)
        else:
            alibi = bool(attn_cfg.get("alibi", True))
        d = hf_config.d_model
        return DecoderConfig(
            name="hf-mpt", vocab_size=hf_config.vocab_size, hidden_size=d,
            intermediate_size=d * getattr(hf_config, "expansion_ratio", 4),
            num_layers=hf_config.n_layers, num_heads=hf_config.n_heads,
            num_kv_heads=hf_config.n_heads,
            max_position_embeddings=getattr(hf_config, "max_seq_len", 2048),
            norm="layernorm",
            layernorm_eps=getattr(hf_config, "layer_norm_epsilon", 1e-5),
            activation="gelu", gated_mlp=False, use_rope=False, alibi=alibi,
            tie_word_embeddings=True, **kw)

    if mt == "qwen":
        # qwen-1.0 (reference qwen/configuration_qwen.py + modeling_qwen.py):
        # fused c_attn, halved fused MLP (w1/w2), RMSNorm, NTK + logn scaling.
        return DecoderConfig(
            name="hf-qwen", vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size // 2,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads,
            max_position_embeddings=getattr(hf_config, "seq_length", 8192),
            rope_theta=getattr(hf_config, "rotary_emb_base", 1e4),
            rms_norm_eps=getattr(hf_config, "layer_norm_epsilon", 1e-6),
            qkv_bias=True,
            use_dynamic_ntk=bool(getattr(hf_config, "use_dynamic_ntk", True)),
            use_logn_attn=bool(getattr(hf_config, "use_logn_attn", True)),
            rope_seq_length=getattr(hf_config, "seq_length", 8192), **kw)

    if mt not in SUPPORTED_MODEL_TYPES:
        raise ValueError(
            f"Unsupported HF model_type {mt!r}; supported layouts: "
            f"{', '.join(SUPPORTED_MODEL_TYPES)}")

    # llama-style configs (model.layers.{i}.self_attn.* state dicts)
    if mt == "gemma2":
        kw.update(
            head_dim=getattr(hf_config, "head_dim", None),
            norm_offset=1.0, activation="gelu_tanh",
            attn_logit_softcap=getattr(hf_config, "attn_logit_softcapping", 50.0),
            final_logit_softcap=getattr(hf_config, "final_logit_softcapping", 30.0),
            query_pre_attn_scalar=float(
                getattr(hf_config, "query_pre_attn_scalar", 256)),
            post_attn_norm=True, post_mlp_norm=True,
            embed_scale=hf_config.hidden_size ** 0.5,
            sliding_window=getattr(hf_config, "sliding_window", None),
            sliding_window_pattern=2)
    elif mt == "phi":
        kw.update(
            norm="layernorm",
            layernorm_eps=getattr(hf_config, "layer_norm_eps", 1e-5),
            activation="gelu_tanh", gated_mlp=False, parallel_block=True,
            o_bias=True, mlp_bias=True, lm_head_bias=True,
            partial_rotary_factor=getattr(hf_config, "partial_rotary_factor", 0.5))
    elif mt in ("stablelm", "stablelm_epoch"):
        kw.update(
            norm="layernorm",
            layernorm_eps=getattr(hf_config, "layer_norm_eps",
                                  getattr(hf_config, "norm_eps", 1e-5)),
            partial_rotary_factor=getattr(
                hf_config, "partial_rotary_factor",
                getattr(hf_config, "rope_pct", 1.0)))
    elif mt == "minicpm":
        hs = hf_config.hidden_size
        kw.update(
            embed_scale=float(getattr(hf_config, "scale_emb", 1)),
            residual_scale=(float(getattr(hf_config, "scale_depth", 1))
                            / hf_config.num_hidden_layers ** 0.5),
            logit_scale=float(getattr(hf_config, "dim_model_base", hs)) / hs)
    elif mt == "mistral":
        kw.setdefault("sliding_window",
                      getattr(hf_config, "sliding_window", None))

    qkv_bias = (mt in ("qwen2", "phi")
                or getattr(hf_config, "attention_bias", False)
                or getattr(hf_config, "use_qkv_bias", False))
    return DecoderConfig(
        name=f"hf-{mt}",
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads", None)
        or hf_config.num_attention_heads,
        max_position_embeddings=hf_config.max_position_embeddings,
        rope_theta=getattr(hf_config, "rope_theta", 1e4),
        rms_norm_eps=getattr(hf_config, "rms_norm_eps", 1e-6),
        qkv_bias=qkv_bias,
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        **kw,
    )


def decoder_params_from_hf(state: Mapping[str, Any], cfg: DecoderConfig,
                           prefix: str = "") -> Params:
    """Convert an HF CausalLM state dict to our decoder pytree.

    Dispatches on the state-dict layout: llama-style `model.layers.*`
    (qwen2/llama/mistral/minicpm + gemma2/phi/stablelm variants via cfg
    flags), qwen-1.0 `transformer.h.*` fused c_attn, and MPT
    `transformer.blocks.*` fused Wqkv.  Unknown layouts raise ValueError.
    """
    if (prefix + "transformer.h.0.attn.c_attn.weight") in state:
        return _decoder_params_from_hf_qwen_v1(state, cfg, prefix)
    if (prefix + "transformer.blocks.0.attn.Wqkv.weight") in state:
        return _decoder_params_from_hf_mpt(state, cfg, prefix)
    if (prefix + "model.layers.0.input_layernorm.weight") not in state:
        known = sorted({k.split(".")[0] for k in state})[:8]
        raise ValueError(
            "Unrecognized HF state-dict layout (top-level keys "
            f"{known}); supported model types: "
            f"{', '.join(SUPPORTED_MODEL_TYPES)}")
    return _decoder_params_from_hf_llama(state, cfg, prefix)


def _norm_from_hf(state: Mapping[str, Any], key: str) -> Params:
    """Norm params; includes the bias when the checkpoint has one
    (stablelm/phi LayerNorm; MPT/qwen/llama norms are weight-only)."""
    p = {"weight": _np(state[key + ".weight"])}
    if (key + ".bias") in state:
        p["bias"] = _np(state[key + ".bias"])
    return p


def _decoder_params_from_hf_llama(state: Mapping[str, Any], cfg: DecoderConfig,
                                  prefix: str = "") -> Params:
    """llama-style layouts: qwen2/llama/mistral/minicpm, plus phi (parallel
    block, `dense`/`fc1/fc2` names, reference phi/modeling_phi.py:203-265),
    gemma2 (4 norms/layer, reference gemma2/modeling_gemma2.py:537-542), and
    stablelm (LayerNorm biases, stablelm/modeling_stablelm_epoch.py:491-497)."""
    def g(key):
        return state[prefix + key]

    def norm(key):
        return _norm_from_hf(state, prefix + key)

    is_phi = cfg.parallel_block
    final_key = ("model.final_layernorm"
                 if (prefix + "model.final_layernorm.weight") in state
                 else "model.norm")
    params: Params = {
        "embed": {"embedding": _np(g("model.embed_tokens.weight"))},
        "layers": [],
        "final_norm": norm(final_key),
    }
    o_name = "self_attn.dense" if is_phi else "self_attn.o_proj"
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        attn = {
            "wq": _t(g(p + "self_attn.q_proj.weight")),
            "wk": _t(g(p + "self_attn.k_proj.weight")),
            "wv": _t(g(p + "self_attn.v_proj.weight")),
            "wo": _t(g(p + o_name + ".weight")),
        }
        if cfg.qkv_bias:
            attn["bq"] = _np(g(p + "self_attn.q_proj.bias"))
            attn["bk"] = _np(g(p + "self_attn.k_proj.bias"))
            attn["bv"] = _np(g(p + "self_attn.v_proj.bias"))
        if cfg.o_bias:
            attn["bo"] = _np(g(p + o_name + ".bias"))
        if (prefix + p + "mlp.deepspeed_moe.gate.wg.weight") in state:
            # reference MoE checkpoint (deepspeed.moe layer naming,
            # llava_qwen1_5_moe.py:534-546 / train.py:549-557 save flavor)
            e = 0
            while (prefix + p + "mlp.deepspeed_moe.experts.deepspeed_experts"
                   f".{e}.up_proj.weight") in state:
                e += 1
            def ew(name):
                return np.stack([
                    _t(g(p + "mlp.deepspeed_moe.experts.deepspeed_experts"
                         f".{j}.{name}.weight")) for j in range(e)])
            mlp = {
                "router": _t(g(p + "mlp.deepspeed_moe.gate.wg.weight")),
                "experts": {"gate": ew("gate_proj"), "up": ew("up_proj"),
                            "down": ew("down_proj")},
            }
            if (prefix + p + "mlp.mlp.up_proj.weight") in state:  # residual
                mlp["residual_mlp"] = {
                    "gate": _t(g(p + "mlp.mlp.gate_proj.weight")),
                    "up": _t(g(p + "mlp.mlp.up_proj.weight")),
                    "down": _t(g(p + "mlp.mlp.down_proj.weight"))}
                mlp["coef"] = _t(g(p + "mlp.coefficient.weight"))
        elif is_phi:
            # phi MLP: fc1/fc2 with biases, no gate
            mlp = {"up": _t(g(p + "mlp.fc1.weight")),
                   "down": _t(g(p + "mlp.fc2.weight"))}
            if cfg.mlp_bias:
                mlp["up_bias"] = _np(g(p + "mlp.fc1.bias"))
                mlp["down_bias"] = _np(g(p + "mlp.fc2.bias"))
        else:
            mlp = {
                "up": _t(g(p + "mlp.up_proj.weight")),
                "down": _t(g(p + "mlp.down_proj.weight")),
            }
            if cfg.gated_mlp:
                mlp["gate"] = _t(g(p + "mlp.gate_proj.weight"))
        layer = {
            "input_norm": norm(p + "input_layernorm"),
            "attn": attn,
            "mlp": mlp,
        }
        if cfg.post_attn_norm:
            # gemma2: post_attention_layernorm normalizes the attn OUTPUT;
            # pre_feedforward_layernorm is the pre-MLP norm
            # (reference gemma2/modeling_gemma2.py:570-598)
            layer["post_attn_norm"] = norm(p + "post_attention_layernorm")
            layer["post_attn_input_norm"] = norm(
                p + "pre_feedforward_layernorm")
        elif not cfg.parallel_block:
            layer["post_attn_input_norm"] = norm(
                p + "post_attention_layernorm")
        if cfg.post_mlp_norm:
            layer["post_mlp_norm"] = norm(p + "post_feedforward_layernorm")
        params["layers"].append(layer)
    if not cfg.tie_word_embeddings and (prefix + "lm_head.weight") in state:
        params["lm_head"] = {"weight": _np(g("lm_head.weight"))}
        if cfg.lm_head_bias and (prefix + "lm_head.bias") in state:
            params["lm_head"]["bias"] = _np(g("lm_head.bias"))
    return params


def _decoder_params_from_hf_qwen_v1(state: Mapping[str, Any],
                                    cfg: DecoderConfig,
                                    prefix: str = "") -> Params:
    """qwen-1.0 layout (reference qwen/modeling_qwen.py): fused
    `attn.c_attn` [3D, D] weight + [3D] bias split into q/k/v (:269,416-418),
    MLP halves w1=up, w2=gate — `intermediate = w1(x) * silu(w2(x))`
    (:570-575) — RMSNorm ln_1/ln_2, transformer.wte embedding."""
    def g(key):
        return state[prefix + key]

    d = cfg.hidden_size
    params: Params = {
        "embed": {"embedding": _np(g("transformer.wte.weight"))},
        "layers": [],
        "final_norm": _norm_from_hf(state, prefix + "transformer.ln_f"),
    }
    for i in range(cfg.num_layers):
        p = f"transformer.h.{i}."
        w = _np(g(p + "attn.c_attn.weight"))   # [3D, D] torch layout
        b = _np(g(p + "attn.c_attn.bias"))     # [3D]
        attn = {
            "wq": w[:d].T, "wk": w[d:2 * d].T, "wv": w[2 * d:].T,
            "bq": b[:d], "bk": b[d:2 * d], "bv": b[2 * d:],
            "wo": _t(g(p + "attn.c_proj.weight")),
        }
        mlp = {
            "up": _t(g(p + "mlp.w1.weight")),
            "gate": _t(g(p + "mlp.w2.weight")),
            "down": _t(g(p + "mlp.c_proj.weight")),
        }
        params["layers"].append({
            "input_norm": _norm_from_hf(state, prefix + p + "ln_1"),
            "attn": attn,
            "post_attn_input_norm": _norm_from_hf(state, prefix + p + "ln_2"),
            "mlp": mlp,
        })
    if (prefix + "lm_head.weight") in state:
        params["lm_head"] = {"weight": _np(g("lm_head.weight"))}
    return params


def _decoder_params_from_hf_mpt(state: Mapping[str, Any], cfg: DecoderConfig,
                                prefix: str = "") -> Params:
    """MPT layout (reference mpt/attention.py:169-189, blocks.py:12-40):
    fused `attn.Wqkv` [3D, D] split at (D, 2D), `attn.out_proj`,
    `ffn.up_proj/down_proj`, weight-only LayerNorms norm_1/norm_2/norm_f,
    tied `transformer.wte` head."""
    def g(key):
        return state[prefix + key]

    d = cfg.hidden_size
    params: Params = {
        "embed": {"embedding": _np(g("transformer.wte.weight"))},
        "layers": [],
        "final_norm": _norm_from_hf(state, prefix + "transformer.norm_f"),
    }
    for i in range(cfg.num_layers):
        p = f"transformer.blocks.{i}."
        w = _np(g(p + "attn.Wqkv.weight"))  # [3D, D]
        attn = {"wq": w[:d].T, "wk": w[d:2 * d].T, "wv": w[2 * d:].T,
                "wo": _t(g(p + "attn.out_proj.weight"))}
        if (prefix + p + "attn.Wqkv.bias") in state:
            b = _np(g(p + "attn.Wqkv.bias"))
            attn["bq"], attn["bk"], attn["bv"] = b[:d], b[d:2 * d], b[2 * d:]
        mlp = {"up": _t(g(p + "ffn.up_proj.weight")),
               "down": _t(g(p + "ffn.down_proj.weight"))}
        if (prefix + p + "ffn.up_proj.bias") in state:
            mlp["up_bias"] = _np(g(p + "ffn.up_proj.bias"))
            mlp["down_bias"] = _np(g(p + "ffn.down_proj.bias"))
        params["layers"].append({
            "input_norm": _norm_from_hf(state, prefix + p + "norm_1"),
            "attn": attn,
            "post_attn_input_norm": _norm_from_hf(state, prefix + p + "norm_2"),
            "mlp": mlp,
        })
    return params


def _norm_to_hf(out: Dict[str, np.ndarray], key: str, p: Params) -> None:
    out[key + ".weight"] = _np(p["weight"])
    if "bias" in p:
        out[key + ".bias"] = _np(p["bias"])


def decoder_params_to_hf(params: Params, cfg: DecoderConfig) -> Dict[str, np.ndarray]:
    """Inverse of decoder_params_from_hf.  The target layout is inferred from
    cfg flags (alibi -> MPT, logn/NTK -> qwen-1.0, parallel_block -> phi,
    post-sublayer norms -> gemma2, else llama-style).  MoE layers use the
    reference's DeepSpeed-MoE key naming so exported checkpoints load in the
    reference (EvalLLaVAMoD* reconstruction, llava_qwen1_5_moe.py:629-681)."""
    if cfg.alibi and not cfg.use_rope:
        return _decoder_params_to_hf_mpt(params, cfg)
    if cfg.use_logn_attn or cfg.use_dynamic_ntk:
        return _decoder_params_to_hf_qwen_v1(params, cfg)

    is_phi = cfg.parallel_block
    o_name = "self_attn.dense" if is_phi else "self_attn.o_proj"
    final_key = "model.final_layernorm" if is_phi else "model.norm"
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": _np(params["embed"]["embedding"]),
    }
    _norm_to_hf(out, final_key, params["final_norm"])
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}."
        _norm_to_hf(out, p + "input_layernorm", layer["input_norm"])
        if cfg.post_attn_norm:
            _norm_to_hf(out, p + "post_attention_layernorm",
                        layer["post_attn_norm"])
            _norm_to_hf(out, p + "pre_feedforward_layernorm",
                        layer["post_attn_input_norm"])
        elif not is_phi:
            _norm_to_hf(out, p + "post_attention_layernorm",
                        layer["post_attn_input_norm"])
        if cfg.post_mlp_norm:
            _norm_to_hf(out, p + "post_feedforward_layernorm",
                        layer["post_mlp_norm"])
        a = layer["attn"]
        out[p + "self_attn.q_proj.weight"] = _t(a["wq"])
        out[p + "self_attn.k_proj.weight"] = _t(a["wk"])
        out[p + "self_attn.v_proj.weight"] = _t(a["wv"])
        out[p + o_name + ".weight"] = _t(a["wo"])
        if "bq" in a:
            out[p + "self_attn.q_proj.bias"] = _np(a["bq"])
            out[p + "self_attn.k_proj.bias"] = _np(a["bk"])
            out[p + "self_attn.v_proj.bias"] = _np(a["bv"])
        if "bo" in a:
            out[p + o_name + ".bias"] = _np(a["bo"])
        m = layer["mlp"]
        if "experts" in m:
            out[p + "mlp.deepspeed_moe.gate.wg.weight"] = _t(m["router"])
            e = np.asarray(m["experts"]["up"]).shape[0]
            names = {"gate_proj": "gate", "up_proj": "up", "down_proj": "down"}
            for j in range(e):
                for hf_name, ours in names.items():
                    if ours in m["experts"]:
                        out[p + "mlp.deepspeed_moe.experts.deepspeed_experts"
                            f".{j}.{hf_name}.weight"] = _t(
                                np.asarray(m["experts"][ours])[j])
            if "residual_mlp" in m:
                for hf_name, ours in names.items():
                    out[p + f"mlp.mlp.{hf_name}.weight"] = _t(
                        m["residual_mlp"][ours])
                out[p + "mlp.coefficient.weight"] = _t(m["coef"])
        elif is_phi:
            out[p + "mlp.fc1.weight"] = _t(m["up"])
            out[p + "mlp.fc2.weight"] = _t(m["down"])
            if "up_bias" in m:
                out[p + "mlp.fc1.bias"] = _np(m["up_bias"])
                out[p + "mlp.fc2.bias"] = _np(m["down_bias"])
        else:
            if "gate" in m:
                out[p + "mlp.gate_proj.weight"] = _t(m["gate"])
            out[p + "mlp.up_proj.weight"] = _t(m["up"])
            out[p + "mlp.down_proj.weight"] = _t(m["down"])
    if "lm_head" in params:
        out["lm_head.weight"] = _np(params["lm_head"]["weight"])
        if "bias" in params["lm_head"]:
            out["lm_head.bias"] = _np(params["lm_head"]["bias"])
    return out


def _decoder_params_to_hf_qwen_v1(params: Params,
                                  cfg: DecoderConfig) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {
        "transformer.wte.weight": _np(params["embed"]["embedding"]),
    }
    _norm_to_hf(out, "transformer.ln_f", params["final_norm"])
    for i, layer in enumerate(params["layers"]):
        p = f"transformer.h.{i}."
        _norm_to_hf(out, p + "ln_1", layer["input_norm"])
        _norm_to_hf(out, p + "ln_2", layer["post_attn_input_norm"])
        a = layer["attn"]
        out[p + "attn.c_attn.weight"] = np.concatenate(
            [_t(a["wq"]), _t(a["wk"]), _t(a["wv"])], axis=0)
        out[p + "attn.c_attn.bias"] = np.concatenate(
            [_np(a["bq"]), _np(a["bk"]), _np(a["bv"])], axis=0)
        out[p + "attn.c_proj.weight"] = _t(a["wo"])
        m = layer["mlp"]
        out[p + "mlp.w1.weight"] = _t(m["up"])
        out[p + "mlp.w2.weight"] = _t(m["gate"])
        out[p + "mlp.c_proj.weight"] = _t(m["down"])
    if "lm_head" in params:
        out["lm_head.weight"] = _np(params["lm_head"]["weight"])
    return out


def _decoder_params_to_hf_mpt(params: Params,
                              cfg: DecoderConfig) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {
        "transformer.wte.weight": _np(params["embed"]["embedding"]),
    }
    _norm_to_hf(out, "transformer.norm_f", params["final_norm"])
    for i, layer in enumerate(params["layers"]):
        p = f"transformer.blocks.{i}."
        _norm_to_hf(out, p + "norm_1", layer["input_norm"])
        _norm_to_hf(out, p + "norm_2", layer["post_attn_input_norm"])
        a = layer["attn"]
        out[p + "attn.Wqkv.weight"] = np.concatenate(
            [_t(a["wq"]), _t(a["wk"]), _t(a["wv"])], axis=0)
        if "bq" in a:
            out[p + "attn.Wqkv.bias"] = np.concatenate(
                [_np(a["bq"]), _np(a["bk"]), _np(a["bv"])], axis=0)
        out[p + "attn.out_proj.weight"] = _t(a["wo"])
        m = layer["mlp"]
        out[p + "ffn.up_proj.weight"] = _t(m["up"])
        out[p + "ffn.down_proj.weight"] = _t(m["down"])
        if "up_bias" in m:
            out[p + "ffn.up_proj.bias"] = _np(m["up_bias"])
            out[p + "ffn.down_proj.bias"] = _np(m["down_bias"])
    return out


# Blip2Model submodule key map (reference multimodal_projector/qformer.py:9-24
# wraps transformers Blip2QFormerModel as `qformer`, plus proj_in/proj_out
# nn.Sequentials and the query_tokens parameter).  Our tree <-> those keys:
_QF_DENSE_MAP = [
    # (our params path inside a layer, HF key inside encoder.layer.{i}.)
    (("self_attn", "q"), "attention.attention.query"),
    (("self_attn", "k"), "attention.attention.key"),
    (("self_attn", "v"), "attention.attention.value"),
    (("self_attn", "o"), "attention.output.dense"),
    (("cross_attn", "q"), "crossattention.attention.query"),
    (("cross_attn", "k"), "crossattention.attention.key"),
    (("cross_attn", "v"), "crossattention.attention.value"),
    (("cross_attn", "o"), "crossattention.output.dense"),
    (("mlp", "fc1"), "intermediate_query.dense"),
    (("mlp", "fc2"), "output_query.dense"),
]
_QF_LN_MAP = [
    (("ln_self",), "attention.output.LayerNorm"),
    (("ln_cross",), "crossattention.output.LayerNorm"),
    (("ln_mlp",), "output_query.LayerNorm"),
]


def _tree_get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _qformer_params_to_hf(params: Params, base: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for name, seq_idx in (("fc1", 0), ("fc2", 2)):
        for side in ("proj_in", "proj_out"):
            p = params[side][name]
            out[f"{base}{side}.{seq_idx}.weight"] = _t(p["kernel"])
            out[f"{base}{side}.{seq_idx}.bias"] = _np(p["bias"])
    out[base + "query_tokens"] = _np(params["queries"])[None]  # [1, Q, W]
    out[base + "qformer.layernorm.weight"] = _np(params["ln_embed"]["weight"])
    out[base + "qformer.layernorm.bias"] = _np(params["ln_embed"]["bias"])
    for i, layer in enumerate(params["layers"]):
        lp = f"{base}qformer.encoder.layer.{i}."
        for path, hf in _QF_DENSE_MAP:
            p = _tree_get(layer, path)
            out[lp + hf + ".weight"] = _t(p["kernel"])
            out[lp + hf + ".bias"] = _np(p["bias"])
        for path, hf in _QF_LN_MAP:
            p = _tree_get(layer, path)
            out[lp + hf + ".weight"] = _np(p["weight"])
            out[lp + hf + ".bias"] = _np(p["bias"])
    return out


def _qformer_params_from_hf(cleaned: Mapping[str, Any],
                            num_layers: int) -> Params:
    def dense(key):
        return {"kernel": _t(cleaned[key + ".weight"]),
                "bias": _np(cleaned[key + ".bias"])}

    def ln(key):
        return {"weight": _np(cleaned[key + ".weight"]),
                "bias": _np(cleaned[key + ".bias"])}

    layers = []
    for i in range(num_layers):
        lp = f"qformer.encoder.layer.{i}."
        layer: Params = {"self_attn": {}, "cross_attn": {}, "mlp": {}}
        for path, hf in _QF_DENSE_MAP:
            node = _tree_get(layer, path[:-1])
            node[path[-1]] = dense(lp + hf)
        for path, hf in _QF_LN_MAP:
            layer[path[0]] = ln(lp + hf)
        layers.append(layer)
    return {
        "proj_in": {"fc1": dense("proj_in.0"), "fc2": dense("proj_in.2")},
        "proj_out": {"fc1": dense("proj_out.0"), "fc2": dense("proj_out.2")},
        "queries": _np(cleaned["query_tokens"])[0],
        "ln_embed": ln("qformer.layernorm"),
        "layers": layers,
    }


def projector_params_to_hf(params: Params,
                           projector_type: str = "mlp2x_gelu",
                           prefix: str = "model.mm_projector."
                           ) -> Dict[str, np.ndarray]:
    """Inverse of projector_params_from_hf (reference key layout)."""
    import re

    out: Dict[str, np.ndarray] = {}
    if projector_type == "linear":
        out[prefix + "image_spatial_proj.weight"] = _t(params["kernel"])
        out[prefix + "image_spatial_proj.bias"] = _np(params["bias"])
        return out
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        for j, layer in enumerate(params["layers"]):
            idx = j * 2  # nn.Sequential: Linear, GELU, Linear, ...
            out[prefix + f"image_spatial_proj.{idx}.weight"] = _t(layer["kernel"])
            out[prefix + f"image_spatial_proj.{idx}.bias"] = _np(layer["bias"])
        return out
    m = re.match(r"^pool_mlp(\d+)x_gelu$", projector_type)
    if m:
        # Pool_Block (reference pool_block.py:8-27): AvgPool2d has no
        # params; the MLP lives under a 'block.' Sequential
        for j, layer in enumerate(params["layers"]):
            idx = j * 2
            out[prefix + f"image_spatial_proj.block.{idx}.weight"] = _t(
                layer["kernel"])
            out[prefix + f"image_spatial_proj.block.{idx}.bias"] = _np(
                layer["bias"])
        return out
    if re.match(r"^(cheap_)?qformer\d+_\d+$", projector_type):
        return _qformer_params_to_hf(params, prefix + "image_spatial_proj.")
    raise NotImplementedError(
        f"HF export for projector '{projector_type}' not implemented")


def export_hf_llava(output_dir: str, cfg, params: Params) -> str:
    """Write a reference-consumable HF checkpoint: config.json (qwen2-style
    llava fields + the moe block the reference embeds in its config,
    llava_qwen1_5_moe.py:48-81) and pytorch_model.bin (decoder +
    mm_projector keys; the frozen tower is referenced by name, exactly like
    the reference's saved checkpoints)."""
    import json
    import os

    import torch

    llm = cfg.llm
    hf_cfg = {
        "architectures": ["LLaVAMoDQwen1_5ForCausalLM" if llm.is_moe
                          else "LlavaQWen1_5ForCausalLM"],
        "model_type": "qwen2",
        "vocab_size": llm.vocab_size,
        "hidden_size": llm.hidden_size,
        "intermediate_size": llm.intermediate_size,
        "num_hidden_layers": llm.num_layers,
        "num_attention_heads": llm.num_heads,
        "num_key_value_heads": llm.num_kv_heads,
        "max_position_embeddings": llm.max_position_embeddings,
        "rope_theta": llm.rope_theta,
        "rms_norm_eps": llm.rms_norm_eps,
        "tie_word_embeddings": llm.tie_word_embeddings,
        "torch_dtype": "bfloat16",
        "mm_image_tower": cfg.vision.name,
        "mm_projector_type": cfg.projector_type,
        "mm_vision_select_layer": cfg.select_layer,
        "mm_vision_select_feature": cfg.select_feature,
        "image_aspect_ratio": cfg.image_aspect_ratio,
    }
    if llm.is_moe:
        hf_cfg["moe"] = {
            "moe_enable": True,
            "moe_mode": "custom",
            "moe_layers_idx": list(llm.moe_layers),
            "num_experts": [llm.moe_num_experts] * len(llm.moe_layers),
            "top_k_experts": llm.moe_top_k,
            "capacity_factor": llm.moe_capacity_factor,
            "eval_capacity_factor": llm.moe_eval_capacity_factor,
            "min_capacity": llm.moe_min_capacity,
            "use_residual": llm.moe_use_residual,
            "router_aux_loss_coef": llm.router_aux_loss_coef,
            "ep_size": 1,
            "train_modules": [],
        }
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.json"), "w") as fh:
        json.dump(hf_cfg, fh, indent=2)

    state = decoder_params_to_hf(params["llm"], llm)
    if "projector" in params:
        state.update(projector_params_to_hf(params["projector"],
                                            cfg.projector_type))
    torch_state = {k: torch.tensor(np.ascontiguousarray(v))
                   for k, v in state.items()}
    torch.save(torch_state, os.path.join(output_dir, "pytorch_model.bin"))
    return output_dir


def vision_params_from_hf(state: Mapping[str, Any], cfg: VisionConfig,
                          prefix: str = "vision_model.") -> Params:
    """Convert an HF CLIPVisionModel / SiglipVisionModel state dict."""
    def g(key):
        return state[prefix + key]

    def ln(key):
        return {"weight": _np(g(key + ".weight")), "bias": _np(g(key + ".bias"))}

    def dense(key):
        return {"kernel": _t(g(key + ".weight")), "bias": _np(g(key + ".bias"))}

    patch_w = _np(g("embeddings.patch_embedding.weight"))  # [D, C, p, p]
    d = patch_w.shape[0]
    patch = {"kernel": patch_w.reshape(d, -1).T}
    if cfg.patch_bias:
        patch["bias"] = _np(g("embeddings.patch_embedding.bias"))

    params: Params = {
        "patch_embed": patch,
        "pos_embed": _np(g("embeddings.position_embedding.weight")),
        "layers": [],
    }
    if cfg.use_class_token:
        params["class_token"] = _np(g("embeddings.class_embedding")).reshape(-1)
    if cfg.use_pre_layernorm:
        # HF CLIP spells it "pre_layrnorm"
        key = "pre_layrnorm" if (prefix + "pre_layrnorm.weight") in state else "pre_layernorm"
        params["pre_ln"] = ln(key)
    params["post_ln"] = ln("post_layernorm")

    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}."
        params["layers"].append({
            "ln1": ln(p + "layer_norm1"),
            "attn": {
                "q": dense(p + "self_attn.q_proj"),
                "k": dense(p + "self_attn.k_proj"),
                "v": dense(p + "self_attn.v_proj"),
                "o": dense(p + "self_attn.out_proj"),
            },
            "ln2": ln(p + "layer_norm2"),
            "mlp": {
                "fc1": dense(p + "mlp.fc1"),
                "fc2": dense(p + "mlp.fc2"),
            },
        })
    return params


def projector_params_from_hf(state: Mapping[str, Any],
                             projector_type: str = "mlp2x_gelu",
                             prefix: str = "") -> Params:
    """Convert a reference mm_projector checkpoint (mm_projector.bin keys
    like 'model.mm_projector.image_spatial_proj.0.weight')."""
    cleaned = {}
    for k, v in state.items():
        k = k.replace("model.mm_projector.", "").replace("mm_projector.", "")
        k = k.replace("image_spatial_proj.", "")
        cleaned[k] = v
    if projector_type == "linear":
        return {"kernel": _t(cleaned["weight"]), "bias": _np(cleaned["bias"])}
    import re

    m = re.match(r"^(pool_)?mlp(\d+)x_gelu$", projector_type)
    if m:
        depth = int(m.group(2))
        # Pool_Block nests the Sequential under 'block.' (pool_block.py:18)
        sub = "block." if m.group(1) else ""
        layers = []
        # reference nn.Sequential indices: 0, 2, 4 ... (GELU between)
        for j in range(depth):
            idx = j * 2
            layers.append({"kernel": _t(cleaned[f"{sub}{idx}.weight"]),
                           "bias": _np(cleaned[f"{sub}{idx}.bias"])})
        return {"layers": layers}
    m = re.match(r"^(cheap_)?qformer(\d+)_(\d+)$", projector_type)
    if m:
        return _qformer_params_from_hf(cleaned, int(m.group(2)))
    raise NotImplementedError(
        f"HF import for projector '{projector_type}' not implemented")
