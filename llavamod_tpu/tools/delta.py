"""Weight-delta tools: make / apply vicuna-style deltas.

Functional port of the reference's model/apply_delta.py:13-38 and
model/make_delta.py semantics on native param trees:

  * params present only in the delta (e.g. the mm projector, new special-
    token embedding rows) pass through unchanged;
  * vocab-resized embedding/lm_head matrices add the base into the
    top-left block (apply) / subtract it (make).

CLI:
  python -m llavamod_tpu.tools.delta apply --base B --delta D --target OUT
  python -m llavamod_tpu.tools.delta make  --base B --target T --delta OUT
"""

from __future__ import annotations

import argparse
from typing import Any

import jax
import numpy as np


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


_RESIZABLE = ("embed/embedding", "lm_head/weight")


def _combine(delta_tree: Any, base_tree: Any, sign: float) -> Any:
    """target = delta + sign * base, tolerating missing/resized leaves."""
    base_leaves = {}

    def record(path, leaf):
        base_leaves[_path_str(path)] = leaf
        return leaf

    jax.tree_util.tree_map_with_path(record, base_tree)

    def combine(path, leaf):
        p = _path_str(path)
        if p not in base_leaves:
            # projector / new modules exist only in the delta
            return leaf
        b = np.asarray(base_leaves[p])
        d = np.asarray(leaf)
        if d.shape == b.shape:
            return d + sign * b
        assert any(p.endswith(r) for r in _RESIZABLE), (
            f"{p} dimension mismatch: {d.shape} vs {b.shape}")
        out = d.copy()
        out[: b.shape[0], : b.shape[1]] += sign * b
        return out

    return jax.tree_util.tree_map_with_path(combine, delta_tree)


def apply_delta(base_params: Any, delta_params: Any) -> Any:
    """target = base + delta (apply_delta.py:24-34)."""
    return _combine(delta_params, base_params, +1.0)


def make_delta(base_params: Any, target_params: Any) -> Any:
    """delta = target - base (make_delta.py)."""
    return _combine(target_params, base_params, -1.0)


def main(argv=None) -> None:
    from llavamod_tpu.models.builder import load_model, save_model

    ap = argparse.ArgumentParser(prog="llavamod_tpu.tools.delta")
    ap.add_argument("mode", choices=["apply", "make"])
    ap.add_argument("--base", required=True)
    ap.add_argument("--delta", required=True)
    ap.add_argument("--target", required=True)
    args = ap.parse_args(argv)

    _, base = load_model(args.base)
    if args.mode == "apply":
        cfg, delta = load_model(args.delta)
        save_model(args.target, cfg, apply_delta(base, delta))
        print(f"wrote {args.target}")
    else:
        cfg, target = load_model(args.target)
        save_model(args.delta, cfg, make_delta(base, target))
        print(f"wrote {args.delta}")


if __name__ == "__main__":
    main()
