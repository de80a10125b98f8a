"""Model save/load: native checkpoints and HF-checkpoint import.

Replaces the reference's 621-line stringly-typed `load_pretrained_model`
dispatcher (model/builder.py:57-621) with two explicit formats:

  * native — a directory with `llavamod_config.json` (LlavaConfig as JSON,
    including the MoE block) + `params/` (orbax).  Covers the reference's
    dense, MoE, and projector-only save flavors in one format.
  * HF import — a directory with HF `config.json` + torch weights; converted
    through interop.hf.  LoRA adapters merge at load (scripts/
    merge_lora_weights.py semantics) via models/lora.py.

`load_pretrained_model(path)` returns (tokenizer, params, cfg, image_
preprocessor, context_len) like the reference API (builder.py:583-621).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import numpy as np

from llavamod_tpu.mm_utils import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    SIGLIP_IMAGE_MEAN,
    SIGLIP_IMAGE_STD,
    ImagePreprocessor,
)
from llavamod_tpu.models.llava import LlavaConfig
from llavamod_tpu.models.llm.config import DecoderConfig
from llavamod_tpu.models.vision.vit import VisionConfig

CONFIG_NAME = "llavamod_config.json"


# ---------------------------------------------------------------------------
# config (de)serialization
# ---------------------------------------------------------------------------

def config_to_dict(cfg: LlavaConfig) -> dict:
    d = dataclasses.asdict(cfg)
    return d


def config_from_dict(d: dict) -> LlavaConfig:
    llm = DecoderConfig(**{k: tuple(v) if k in ("moe_layers",) else v
                           for k, v in d["llm"].items()})
    vision = VisionConfig(**d["vision"])
    rest = {k: v for k, v in d.items() if k not in ("llm", "vision")}
    if "s2_scales" in rest:
        rest["s2_scales"] = tuple(rest["s2_scales"])
    return LlavaConfig(llm=llm, vision=vision, **rest)


def save_model(output_dir: str, cfg: LlavaConfig, params: Any) -> str:
    import orbax.checkpoint as ocp

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, CONFIG_NAME), "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(os.path.join(output_dir, "params")), params,
              force=True)
    ckpt.wait_until_finished()
    return output_dir


def load_model(model_dir: str, template_params: Optional[Any] = None
               ) -> Tuple[LlavaConfig, Any]:
    import orbax.checkpoint as ocp

    with open(os.path.join(model_dir, CONFIG_NAME)) as f:
        cfg = config_from_dict(json.load(f))
    path = os.path.abspath(os.path.join(model_dir, "params"))
    if template_params is None:
        # restore from the checkpoint's own metadata: HF-converted trees can
        # differ structurally from a fresh init (weight-only norms, biases,
        # tied heads), so an init-shaped template would be wrong
        params = ocp.StandardCheckpointer().restore(path)
    else:
        params = ocp.StandardCheckpointer().restore(path, template_params)
    return cfg, params


# ---------------------------------------------------------------------------
# HF import
# ---------------------------------------------------------------------------

def _load_torch_state(model_path: str) -> dict:
    """Load all weights from an HF checkpoint dir (safetensors or .bin)."""
    state = {}
    names = sorted(os.listdir(model_path))
    st_files = [n for n in names if n.endswith(".safetensors")]
    bin_files = [n for n in names if n.endswith(".bin") and "optimizer" not in n]
    if st_files:
        from safetensors import safe_open

        for fname in st_files:
            with safe_open(os.path.join(model_path, fname), framework="np") as f:
                for k in f.keys():
                    state[k] = f.get_tensor(k)
    elif bin_files:
        import torch

        for fname in bin_files:
            state.update(torch.load(os.path.join(model_path, fname),
                                    map_location="cpu", weights_only=True))
    else:
        raise FileNotFoundError(f"no weights found in {model_path}")
    return state


def import_hf_llava(model_path: str,
                    vision_path: Optional[str] = None,
                    projector_type: str = "mlp2x_gelu",
                    image_aspect_ratio: str = "pad",
                    select_layer: int = -2) -> Tuple[LlavaConfig, Any]:
    """Import an HF-format LLaVA-style checkpoint directory."""
    import transformers

    from llavamod_tpu.interop.hf import (
        decoder_config_from_hf,
        decoder_params_from_hf,
        projector_params_from_hf,
        vision_params_from_hf,
    )
    from llavamod_tpu.models.vision.vit import vision_configs

    hf_cfg = transformers.AutoConfig.from_pretrained(model_path)
    llm_cfg = decoder_config_from_hf(hf_cfg)
    state = _load_torch_state(model_path)
    llm_params = decoder_params_from_hf(state, llm_cfg)

    tower_name = vision_path or getattr(
        hf_cfg, "mm_image_tower", getattr(hf_cfg, "mm_vision_tower",
                                          "clip-vit-l-336"))
    vis_cfg = vision_configs.get(vision_configs.match_substring(tower_name)
                                 or "clip-vit-l-336")
    cfg = LlavaConfig(
        llm=llm_cfg, vision=vis_cfg,
        projector_type=getattr(hf_cfg, "mm_projector_type", projector_type),
        select_layer=getattr(hf_cfg, "mm_vision_select_layer", select_layer),
        image_aspect_ratio=getattr(hf_cfg, "image_aspect_ratio",
                                   image_aspect_ratio))

    params = {"llm": llm_params}
    proj_keys = {k: v for k, v in state.items() if "mm_projector" in k}
    if proj_keys:
        params["projector"] = projector_params_from_hf(proj_keys,
                                                       cfg.projector_type)
    if vision_path and os.path.isdir(vision_path):
        vis_state = _load_torch_state(vision_path)
        params["vision"] = vision_params_from_hf(vis_state, vis_cfg)
    return cfg, params


def make_image_preprocessor(cfg: LlavaConfig) -> ImagePreprocessor:
    siglip = not cfg.vision.use_class_token
    return ImagePreprocessor(
        size=cfg.vision.image_size,
        mean=SIGLIP_IMAGE_MEAN if siglip else CLIP_IMAGE_MEAN,
        std=SIGLIP_IMAGE_STD if siglip else CLIP_IMAGE_STD,
        image_aspect_ratio=cfg.image_aspect_ratio)


def load_pretrained_model(model_path: str,
                          model_base: Optional[str] = None,
                          vision_path: Optional[str] = None,
                          tokenizer_path: Optional[str] = None,
                          context_len: int = 2048):
    """Reference-shaped loader: returns (tokenizer, params, cfg,
    image_preprocessor, context_len)."""
    if os.path.exists(os.path.join(model_path, CONFIG_NAME)):
        cfg, params = load_model(model_path)
    else:
        cfg, params = import_hf_llava(model_path, vision_path=vision_path)
        if model_base is not None:
            from llavamod_tpu.models.lora import merge_lora_checkpoint

            cfg, params = merge_lora_checkpoint(model_path, model_base, cfg,
                                                params)

    import transformers

    from llavamod_tpu.interop.tiktoken_tokenizers import load_tiktoken_tokenizer

    tok_path = tokenizer_path or model_path
    # qwen-1.0 / stablelm checkpoints carry a *.tiktoken vocab — load it
    # self-contained instead of requiring trust_remote_code artifacts
    tokenizer = load_tiktoken_tokenizer(tok_path)
    if tokenizer is None:
        tokenizer = transformers.AutoTokenizer.from_pretrained(tok_path)
    return tokenizer, params, cfg, make_image_preprocessor(cfg), context_len


def quantize_for_serving(params, cfg):
    """int8-W8A8 serving of a loaded model: attention/MLP, MoE experts, LM
    head, and the embedding table all int8 (2x MXU peak, half the weight
    reads — measured +27-32% batched decode on v5e, BENCH_NOTES.md).  The
    TPU-native answer to the reference's load_4bit/load_8bit bitsandbytes
    flags (model/builder.py:24-36)."""
    from llavamod_tpu.models.llm.decoder import quantize_decoder_int8

    out = dict(params)
    out["llm"] = quantize_decoder_int8(params["llm"], include_lm_head=True,
                                       include_experts=True,
                                       include_embed=True)
    return out
