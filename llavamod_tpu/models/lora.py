"""LoRA adapters as a separate parameter tree.

The reference uses PEFT LoRA (train/train.py:300-331, align_train.py:290-327)
and merges adapters into plain Linears for export (scripts/
merge_lora_weights.py, scripts/merge_moe_lora_weights.py:31-85).  The
functional equivalent: a LoRA tree parallel to the base params; the forward
pass consumes `merge_lora(base, lora)` — a per-weight rank-r matmul that is
O(r/B*T) relative cost, so merging on the fly each step is effectively free
and no module surgery is needed.  Export = merge once and save.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# llm linear weights eligible for LoRA; mirrors find_all_linear_names
# (train/train_utils.py:64-79) which excludes projector/tower/lm_head.
DEFAULT_TARGETS = (
    r"llm/layers/\d+/attn/(wq|wk|wv|wo)$",
    r"llm/layers/\d+/mlp/(gate|up|down)$",
    r"llm/layers/\d+/mlp/experts/(gate|up|down)$",
)


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    alpha: int = 32
    dropout: float = 0.0   # dropout unused at inference; train-side optional
    target_patterns: Tuple[str, ...] = DEFAULT_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _is_target(path: str, cfg: LoraConfig) -> bool:
    return any(re.search(pat, path) for pat in cfg.target_patterns)


def init_lora(params: Any, cfg: LoraConfig, key) -> Any:
    """Build a LoRA tree: matching 2D/3D kernels get {'a','b'}, others None.

    a ~ N(0, 1/r) (kaiming-ish), b = 0 so the adapter starts as identity —
    same as PEFT.  Expert weights [E, in, out] get per-expert adapters.
    """
    leaves = []

    def make(path, leaf):
        p = _path_str(path)
        if not _is_target(p, cfg) or np.ndim(leaf) < 2:
            return None
        sub = jax.random.fold_in(key, len(leaves))
        leaves.append(p)
        if np.ndim(leaf) == 3:  # experts [E, din, dout]
            e, din, dout = leaf.shape
            a = jax.random.normal(sub, (e, din, cfg.r), jnp.float32) / cfg.r
            b = jnp.zeros((e, cfg.r, dout), jnp.float32)
        else:
            din, dout = leaf.shape
            a = jax.random.normal(sub, (din, cfg.r), jnp.float32) / cfg.r
            b = jnp.zeros((cfg.r, dout), jnp.float32)
        return {"a": a.astype(leaf.dtype), "b": b.astype(leaf.dtype)}

    return jax.tree_util.tree_map_with_path(make, params)


def merge_lora(params: Any, lora: Any, cfg: LoraConfig) -> Any:
    """base + scaling * a @ b, leaf-wise (None lora leaves pass through)."""

    def combine(base, ad):
        if ad is None:
            return base
        delta = jnp.einsum("...ir,...ro->...io", ad["a"], ad["b"])
        return base + cfg.scaling * delta.astype(base.dtype)

    return jax.tree_util.tree_map(
        combine, params, lora,
        is_leaf=lambda x: x is None or (isinstance(x, dict) and "a" in x))


def merge_and_export(params: Any, lora: Any, cfg: LoraConfig) -> Any:
    """Materialize merged weights for saving (scripts/merge_*_weights.py)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x),
                                  merge_lora(params, lora, cfg))


def merge_lora_checkpoint(adapter_path: str, base_path: str, cfg, params):
    """Load a PEFT adapter checkpoint and merge into base weights.

    Handles the reference's adapter layout: adapter_model.bin with
    'base_model.model.<hf path>.lora_A.weight' keys + non_lora_trainables.bin
    (train/train.py:535-545)."""
    raise NotImplementedError(
        "PEFT-format adapter import lands with the HF-interop expansion; "
        "native LoRA checkpoints merge via merge_and_export")
