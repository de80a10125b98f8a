"""Merge LoRA adapters into base weights and save a standalone model.

Mirror of reference scripts/merge_lora_weights.py and
scripts/merge_moe_lora_weights.py:31-85 (expert adapters merge per expert —
handled transparently by the stacked-E einsum in models/lora.merge_lora).

  python -m llavamod_tpu.tools.merge_lora --model-path ADAPTER_DIR \
      --model-base BASE_DIR --save-path OUT_DIR
"""

from __future__ import annotations

import argparse

import numpy as np


def merge_lora_weights(model_path: str, model_base: str, save_path: str) -> str:
    import jax

    from llavamod_tpu.models.builder import (
        CONFIG_NAME,
        import_hf_llava,
        load_model,
        save_model,
    )
    from llavamod_tpu.models.lora import merge_lora_checkpoint
    import os

    if os.path.exists(os.path.join(model_base, CONFIG_NAME)):
        cfg, params = load_model(model_base)
    else:
        cfg, params = import_hf_llava(model_base)
    cfg, merged = merge_lora_checkpoint(model_path, model_base, cfg, params)
    merged = jax.tree_util.tree_map(lambda x: np.asarray(x), merged)
    return save_model(save_path, cfg, merged)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="llavamod_tpu.tools.merge_lora")
    ap.add_argument("--model-path", required=True, help="adapter dir")
    ap.add_argument("--model-base", required=True)
    ap.add_argument("--save-path", required=True)
    args = ap.parse_args(argv)
    print(f"wrote {merge_lora_weights(args.model_path, args.model_base, args.save_path)}")


if __name__ == "__main__":
    main()
