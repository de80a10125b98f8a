"""Convert an HF checkpoint directory to the native checkpoint format.

    python -m llavamod_tpu.tools.import_hf --hf-path <dir> --output <dir> \
        [--vision-tower clip-vit-l-336] [--projector mlp2x_gelu]

Works for every supported LLM family (interop.hf.SUPPORTED_MODEL_TYPES):
the state-dict layout is auto-detected (llama-style, gemma2, phi, stablelm,
qwen-1.0 fused c_attn, MPT fused Wqkv) and an unknown layout fails with a
ValueError naming the supported types.  If the HF config carries the
reference's multimodal fields (mm_image_tower / mm_projector_type /
embedded moe block, llava_qwen1_5_moe.py:48-81), those are honored;
otherwise a text-only LLaVA shell is written with a fresh projector and the
named (frozen) vision tower, i.e. a stage-1-ready init — exactly what the
reference's pretrain stage starts from.
"""

from __future__ import annotations

import argparse
import glob
import os


def _load_state(hf_path: str):
    """Gather the full torch state dict from pytorch_model*.bin /
    model*.safetensors shards."""
    state = {}
    bins = sorted(glob.glob(os.path.join(hf_path, "pytorch_model*.bin")))
    safes = sorted(glob.glob(os.path.join(hf_path, "*.safetensors")))
    if bins:
        import torch

        for b in bins:
            state.update(torch.load(b, map_location="cpu",
                                    weights_only=True))
    elif safes:
        from safetensors import safe_open

        for s in safes:
            with safe_open(s, framework="np") as f:
                for k in f.keys():
                    state[k] = f.get_tensor(k)
    else:
        raise FileNotFoundError(
            f"no pytorch_model*.bin or *.safetensors under {hf_path}")
    return state


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="llavamod_tpu.tools.import_hf")
    ap.add_argument("--hf-path", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--vision-tower", default=None,
                    help="tower name if the HF config has no mm_image_tower")
    ap.add_argument("--projector", default=None,
                    help="projector spec if the HF config has none")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import transformers

    from llavamod_tpu.interop.hf import (
        decoder_config_from_hf,
        decoder_params_from_hf,
        projector_params_from_hf,
        vision_params_from_hf,
    )
    from llavamod_tpu.models import llava
    from llavamod_tpu.models.builder import save_model
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.vision.vit import vision_configs

    hf_cfg = transformers.AutoConfig.from_pretrained(args.hf_path)
    llm_cfg = decoder_config_from_hf(hf_cfg)
    state = _load_state(args.hf_path)

    tower = (getattr(hf_cfg, "mm_image_tower", None)
             or getattr(hf_cfg, "mm_vision_tower", None)
             or args.vision_tower or "clip-vit-l-336")
    proj = (getattr(hf_cfg, "mm_projector_type", None)
            or args.projector or "mlp2x_gelu")
    cfg = LlavaConfig(
        llm=llm_cfg, vision=vision_configs.get(tower), projector_type=proj,
        select_layer=getattr(hf_cfg, "mm_vision_select_layer", -2),
        select_feature=getattr(hf_cfg, "mm_vision_select_feature", "patch"),
        image_aspect_ratio=getattr(hf_cfg, "image_aspect_ratio", "pad"),
        max_images=1)

    # fresh shell, then overwrite whatever the checkpoint provides
    params = llava.init(cfg, jax.random.PRNGKey(args.seed))
    params["llm"] = decoder_params_from_hf(state, llm_cfg)
    mm_keys = [k for k in state if "mm_projector" in k]
    if mm_keys:
        params["projector"] = projector_params_from_hf(
            {k: state[k] for k in mm_keys}, proj)
        print(f"[import] projector restored from {len(mm_keys)} keys")
    vt_keys = [k for k in state if "vision_model." in k]
    if vt_keys:
        prefix = ("vision_tower.vision_tower.vision_model."
                  if any(k.startswith("vision_tower.") for k in vt_keys)
                  else "vision_model.")
        params["vision"] = vision_params_from_hf(state, cfg.vision,
                                                 prefix=prefix)
        print(f"[import] vision tower restored from {len(vt_keys)} keys")

    out = save_model(args.output, cfg, params)
    print(f"[import] {hf_cfg.model_type} checkpoint -> {out}")


if __name__ == "__main__":
    main()
