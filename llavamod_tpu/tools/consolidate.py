"""Consolidate any loadable checkpoint (HF import, LoRA+base, native) into
one native directory (reference model/consolidate.py:14-21).

  python -m llavamod_tpu.tools.consolidate --src PATH [--base BASE] --dst OUT
"""

from __future__ import annotations

import argparse

import numpy as np


def consolidate_ckpt(src: str, dst: str, base: str = None) -> str:
    import jax

    from llavamod_tpu.models.builder import load_pretrained_model, save_model

    _, params, cfg, _, _ = load_pretrained_model(src, model_base=base)
    params = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    return save_model(dst, cfg, params)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="llavamod_tpu.tools.consolidate")
    ap.add_argument("--src", required=True)
    ap.add_argument("--base", default=None)
    ap.add_argument("--dst", required=True)
    args = ap.parse_args(argv)
    print(f"wrote {consolidate_ckpt(args.src, args.dst, args.base)}")


if __name__ == "__main__":
    main()
