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
    """Map an HF Qwen2/Llama/Mistral-style config to DecoderConfig,
    including the reference's embedded `moe` block
    (llava_qwen1_5_moe.py:48-81)."""
    mt = getattr(hf_config, "model_type", "llama")
    qkv_bias = mt in ("qwen2",) or getattr(hf_config, "attention_bias", False)
    kw = {}
    moe = getattr(hf_config, "moe", None)
    if isinstance(moe, dict) and moe.get("moe_enable"):
        num_experts = moe.get("num_experts", 4)
        if isinstance(num_experts, (list, tuple)):
            num_experts = num_experts[0]
        kw = dict(
            moe_num_experts=int(num_experts),
            moe_top_k=int(moe.get("top_k_experts", 2)),
            moe_capacity_factor=float(moe.get("capacity_factor", 1.5)),
            moe_eval_capacity_factor=float(
                moe.get("eval_capacity_factor", 2.0)),
            moe_min_capacity=int(moe.get("min_capacity", 4)),
            moe_layers=tuple(moe.get("moe_layers_idx") or ()),
            moe_use_residual=bool(moe.get("use_residual", False)),
            router_aux_loss_coef=float(
                moe.get("router_aux_loss_coef", 0.01)),
        )
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
        **kw,
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
        else:
            mlp = {
                "gate": _t(g(p + "mlp.gate_proj.weight")),
                "up": _t(g(p + "mlp.up_proj.weight")),
                "down": _t(g(p + "mlp.down_proj.weight")),
            }
        layer = {
            "input_norm": {"weight": _np(g(p + "input_layernorm.weight"))},
            "attn": attn,
            "post_attn_input_norm": {
                "weight": _np(g(p + "post_attention_layernorm.weight"))},
            "mlp": mlp,
        }
        params["layers"].append(layer)
    if not cfg.tie_word_embeddings and (prefix + "lm_head.weight") in state:
        params["lm_head"] = {"weight": _np(g("lm_head.weight"))}
    return params


def decoder_params_to_hf(params: Params, cfg: DecoderConfig) -> Dict[str, np.ndarray]:
    """Inverse of decoder_params_from_hf; MoE layers use the reference's
    DeepSpeed-MoE key naming so exported checkpoints load in the reference
    (EvalLLaVAMoD* reconstruction, llava_qwen1_5_moe.py:629-681)."""
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
        else:
            if "gate" in m:
                out[p + "mlp.gate_proj.weight"] = _t(m["gate"])
            out[p + "mlp.up_proj.weight"] = _t(m["up"])
            out[p + "mlp.down_proj.weight"] = _t(m["down"])
    if "lm_head" in params:
        out["lm_head.weight"] = _np(params["lm_head"]["weight"])
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
    m = re.match(r"^(cheap_)?qformer(\d+)_(\d+)$", projector_type)
    if m:
        return _qformer_params_from_hf(cleaned, int(m.group(2)))
    raise NotImplementedError(
        f"HF import for projector '{projector_type}' not implemented")
