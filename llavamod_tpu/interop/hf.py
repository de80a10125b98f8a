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


def decoder_config_from_hf(hf_config) -> DecoderConfig:
    """Map an HF Qwen2/Llama/Mistral-style config to DecoderConfig."""
    mt = getattr(hf_config, "model_type", "llama")
    qkv_bias = mt in ("qwen2",) or getattr(hf_config, "attention_bias", False)
    return DecoderConfig(
        name=f"hf-{mt}",
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads",
                             hf_config.num_attention_heads),
        max_position_embeddings=hf_config.max_position_embeddings,
        rope_theta=getattr(hf_config, "rope_theta", 1e4),
        rms_norm_eps=getattr(hf_config, "rms_norm_eps", 1e-6),
        qkv_bias=qkv_bias,
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
    )


def decoder_params_from_hf(state: Mapping[str, Any], cfg: DecoderConfig,
                           prefix: str = "") -> Params:
    """Convert an HF CausalLM state dict (Qwen2/Llama/Mistral layout)."""
    def g(key):
        return state[prefix + key]

    params: Params = {
        "embed": {"embedding": _np(g("model.embed_tokens.weight"))},
        "layers": [],
        "final_norm": {"weight": _np(g("model.norm.weight"))},
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        attn = {
            "wq": _t(g(p + "self_attn.q_proj.weight")),
            "wk": _t(g(p + "self_attn.k_proj.weight")),
            "wv": _t(g(p + "self_attn.v_proj.weight")),
            "wo": _t(g(p + "self_attn.o_proj.weight")),
        }
        if cfg.qkv_bias:
            attn["bq"] = _np(g(p + "self_attn.q_proj.bias"))
            attn["bk"] = _np(g(p + "self_attn.k_proj.bias"))
            attn["bv"] = _np(g(p + "self_attn.v_proj.bias"))
        layer = {
            "input_norm": {"weight": _np(g(p + "input_layernorm.weight"))},
            "attn": attn,
            "post_attn_input_norm": {
                "weight": _np(g(p + "post_attention_layernorm.weight"))},
            "mlp": {
                "gate": _t(g(p + "mlp.gate_proj.weight")),
                "up": _t(g(p + "mlp.up_proj.weight")),
                "down": _t(g(p + "mlp.down_proj.weight")),
            },
        }
        params["layers"].append(layer)
    if not cfg.tie_word_embeddings and (prefix + "lm_head.weight") in state:
        params["lm_head"] = {"weight": _np(g("lm_head.weight"))}
    return params


def decoder_params_to_hf(params: Params, cfg: DecoderConfig) -> Dict[str, np.ndarray]:
    """Inverse of decoder_params_from_hf (dense layers only)."""
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": _np(params["embed"]["embedding"]),
        "model.norm.weight": _np(params["final_norm"]["weight"]),
    }
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}."
        out[p + "input_layernorm.weight"] = _np(layer["input_norm"]["weight"])
        out[p + "post_attention_layernorm.weight"] = _np(
            layer["post_attn_input_norm"]["weight"])
        a = layer["attn"]
        out[p + "self_attn.q_proj.weight"] = _t(a["wq"])
        out[p + "self_attn.k_proj.weight"] = _t(a["wk"])
        out[p + "self_attn.v_proj.weight"] = _t(a["wv"])
        out[p + "self_attn.o_proj.weight"] = _t(a["wo"])
        if "bq" in a:
            out[p + "self_attn.q_proj.bias"] = _np(a["bq"])
            out[p + "self_attn.k_proj.bias"] = _np(a["bk"])
            out[p + "self_attn.v_proj.bias"] = _np(a["bv"])
        m = layer["mlp"]
        if "gate" in m:
            out[p + "mlp.gate_proj.weight"] = _t(m["gate"])
        out[p + "mlp.up_proj.weight"] = _t(m["up"])
        out[p + "mlp.down_proj.weight"] = _t(m["down"])
    if "lm_head" in params:
        out["lm_head.weight"] = _np(params["lm_head"]["weight"])
    return out


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

    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        depth = int(m.group(1))
        layers = []
        # reference nn.Sequential indices: 0, 2, 4 ... (GELU between)
        for j in range(depth):
            idx = j * 2
            layers.append({"kernel": _t(cleaned[f"{idx}.weight"]),
                           "bias": _np(cleaned[f"{idx}.bias"])})
        return {"layers": layers}
    raise NotImplementedError(
        f"HF import for projector '{projector_type}' not implemented")
