"""Extract the mm projector from a full checkpoint into mm_projector.bin.

Mirror of reference scripts/extract_mm_projector.py:26-46 — accepts either a
torch checkpoint dir/file (keys filtered on 'mm_projector') or one of our
native model dirs (projector subtree re-exported in the reference layout).

  python -m llavamod_tpu.tools.extract_mm_projector --model-path CKPT \
      --output mm_projector.bin
"""

from __future__ import annotations

import argparse
import os


def extract_mm_projector(model_path: str, output: str,
                         projector_type: str = "mlp2x_gelu") -> str:
    from llavamod_tpu.models.builder import CONFIG_NAME

    if os.path.isdir(model_path) and os.path.exists(
            os.path.join(model_path, CONFIG_NAME)):
        from llavamod_tpu.models.builder import load_model
        from llavamod_tpu.train.checkpoint import save_mm_projector

        cfg, params = load_model(model_path)
        return save_mm_projector(output, params["projector"],
                                 cfg.projector_type)

    import torch

    if os.path.isdir(model_path):
        names = [n for n in sorted(os.listdir(model_path))
                 if n.endswith(".bin") and "optimizer" not in n]
        state = {}
        for n in names:
            state.update(torch.load(os.path.join(model_path, n),
                                    map_location="cpu", weights_only=True))
    else:
        state = torch.load(model_path, map_location="cpu", weights_only=True)
    proj = {k: v.float() for k, v in state.items() if "mm_projector" in k}
    assert proj, f"no mm_projector keys found in {model_path}"
    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    torch.save(proj, output)
    return output


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="llavamod_tpu.tools.extract_mm_projector")
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)
    print(f"wrote {extract_mm_projector(args.model_path, args.output)}")


if __name__ == "__main__":
    main()
