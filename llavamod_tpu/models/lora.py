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


# ---------------------------------------------------------------------------
# adapter checkpoints: native save/load + PEFT-format interop
# ---------------------------------------------------------------------------

# our param-tree suffix -> HF module name (reference PEFT target naming,
# train/train_utils.py:64-79 / scripts/merge_moe_lora_weights.py)
_HF_MODULE_NAMES = {
    "attn/wq": "self_attn.q_proj",
    "attn/wk": "self_attn.k_proj",
    "attn/wv": "self_attn.v_proj",
    "attn/wo": "self_attn.o_proj",
    "mlp/gate": "mlp.gate_proj",
    "mlp/up": "mlp.up_proj",
    "mlp/down": "mlp.down_proj",
}
_OUR_SUFFIXES = {v: k for k, v in _HF_MODULE_NAMES.items()}


def _peft_key(path: str, expert: Optional[int] = None) -> Optional[str]:
    """'llm/layers/3/mlp/up' -> 'base_model.model.model.layers.3.mlp.up_proj'.

    Expert adapters ('.../mlp/experts/up' with a leading E axis) export
    per-expert under DeepSpeed-MoE naming
    (scripts/merge_moe_lora_weights.py:31-68)."""
    m = re.match(r"^llm/layers/(\d+)/(attn/w[qkvo]|mlp/(?:gate|up|down))$", path)
    if m:
        hf = _HF_MODULE_NAMES[m.group(2)]
        return f"base_model.model.model.layers.{m.group(1)}.{hf}"
    m = re.match(r"^llm/layers/(\d+)/mlp/experts/(gate|up|down)$", path)
    if m and expert is not None:
        hf = _HF_MODULE_NAMES["mlp/" + m.group(2)]
        mod = hf.split(".")[-1]
        return (f"base_model.model.model.layers.{m.group(1)}"
                f".mlp.deepspeed_moe.experts.deepspeed_experts.{expert}.{mod}")
    return None


def save_lora_adapter(output_dir: str, lora: Any, cfg: LoraConfig) -> str:
    """Write a PEFT-compatible adapter dir: adapter_config.json +
    adapter_model.bin (train/train.py:535-545 layout)."""
    import json
    import os

    import torch

    os.makedirs(output_dir, exist_ok=True)
    state: Dict[str, Any] = {}

    def visit(path, leaf):
        if leaf is None:
            return leaf
        full = _path_str(path)  # ends in '/a' or '/b' (the adapter leaves)
        if full.endswith("/a"):
            p, which = full[:-2], "lora_A"
        elif full.endswith("/b"):
            p, which = full[:-2], "lora_B"
        else:
            return leaf
        a_or_b = np.asarray(leaf, np.float32)
        if a_or_b.ndim == 3:  # experts [E, ...]
            for e in range(a_or_b.shape[0]):
                key = _peft_key(p, expert=e)
                if key is None:
                    continue
                # ours: a [in, r] / b [r, out]; PEFT: A [r, in] / B [out, r]
                state[f"{key}.{which}.weight"] = torch.tensor(a_or_b[e].T.copy())
        else:
            key = _peft_key(p)
            if key is not None:
                state[f"{key}.{which}.weight"] = torch.tensor(a_or_b.T.copy())
        return leaf

    jax.tree_util.tree_map_with_path(visit, lora)
    torch.save(state, os.path.join(output_dir, "adapter_model.bin"))
    with open(os.path.join(output_dir, "adapter_config.json"), "w") as fh:
        json.dump({"peft_type": "LORA", "r": cfg.r, "lora_alpha": cfg.alpha,
                   "lora_dropout": cfg.dropout,
                   "target_modules": sorted({v.split(".")[-1]
                                             for v in _HF_MODULE_NAMES.values()}),
                   "bias": "none", "task_type": "CAUSAL_LM"}, fh, indent=2)
    return output_dir


def load_lora_adapter(adapter_dir: str, params: Any) -> Tuple[Any, LoraConfig]:
    """Read a PEFT adapter dir back into a lora tree shaped like `params`."""
    import json
    import os

    import torch

    with open(os.path.join(adapter_dir, "adapter_config.json")) as fh:
        pc = json.load(fh)
    cfg = LoraConfig(r=pc["r"], alpha=pc["lora_alpha"],
                     dropout=pc.get("lora_dropout", 0.0))
    state = torch.load(os.path.join(adapter_dir, "adapter_model.bin"),
                       map_location="cpu", weights_only=True)
    state = {k: np.asarray(v.float()) for k, v in state.items()}
    return lora_tree_from_peft(state, params, cfg), cfg


def _parse_peft_key(key: str):
    """PEFT key -> (our path, 'a'|'b', expert index or None)."""
    key = re.sub(r"^base_model\.(model\.)+", "", key)
    which = "a" if ".lora_A." in key else ("b" if ".lora_B." in key else None)
    if which is None:
        return None
    mod = key.split(".lora_")[0]
    mod = re.sub(r"^model\.", "", mod)
    m = re.match(
        r"^layers\.(\d+)\.mlp\.deepspeed_moe\.experts\.deepspeed_experts"
        r"\.(\d+)\.(\w+)$", mod)
    if m:
        suffix = _OUR_SUFFIXES.get("mlp." + m.group(3))
        if suffix is None:
            return None
        return f"llm/layers/{m.group(1)}/{suffix}".replace(
            "mlp/", "mlp/experts/"), which, int(m.group(2))
    m = re.match(r"^layers\.(\d+)\.(self_attn\.\w+|mlp\.\w+)$", mod)
    if m:
        suffix = _OUR_SUFFIXES.get(m.group(2))
        if suffix is None:
            return None
        return f"llm/layers/{m.group(1)}/{suffix}", which, None
    return None


def lora_tree_from_peft(state: Dict[str, np.ndarray], params: Any,
                        cfg: LoraConfig) -> Any:
    """Assemble {'a','b'} leaves (ours layout) from PEFT tensors."""
    by_path: Dict[str, Dict[str, Any]] = {}
    for key, val in state.items():
        parsed = _parse_peft_key(key)
        if parsed is None:
            continue
        path, which, expert = parsed
        slot = by_path.setdefault(path, {})
        if expert is None:
            slot[which] = val.T  # PEFT A [r,in] -> ours a [in,r]; B likewise
        else:
            slot.setdefault(which, {})[expert] = val.T

    def build(path, leaf):
        p = _path_str(path)
        entry = by_path.get(p)
        if entry is None:
            return None
        a, b = entry.get("a"), entry.get("b")
        if isinstance(a, dict):  # experts: stack on leading E axis
            e = np.asarray(leaf).shape[0]
            a = np.stack([a[i] for i in range(e)])
            b = np.stack([b[i] for i in range(e)])
        if a is None or b is None:
            return None
        return {"a": jnp.asarray(a, jnp.float32),
                "b": jnp.asarray(b, jnp.float32)}

    return jax.tree_util.tree_map_with_path(build, params)


def merge_lora_checkpoint(adapter_path: str, base_path: str, cfg, params):
    """Reference LoRA-checkpoint load path (model/builder.py:82-155):
    base weights + adapter_model.bin (+ non_lora_trainables.bin for the
    projector etc.) -> merged params.  `cfg`/`params` are the already-loaded
    BASE model; returns (cfg, merged_params)."""
    import os

    lora, lcfg = load_lora_adapter(adapter_path, params)
    merged = merge_lora(params, lora, lcfg)
    extra = os.path.join(adapter_path, "non_lora_trainables.bin")
    if os.path.exists(extra):
        import torch

        from llavamod_tpu.interop.hf import projector_params_from_hf

        state = torch.load(extra, map_location="cpu", weights_only=True)
        proj = {k: v for k, v in state.items() if "mm_projector" in k}
        if proj:
            merged["projector"] = projector_params_from_hf(
                proj, cfg.projector_type)
    return cfg, merged
