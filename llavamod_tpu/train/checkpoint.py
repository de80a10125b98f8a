"""Checkpoint save/restore.

Replaces the reference's three save flavors (SURVEY.md §5 checkpoint/resume):
  (a) stage-1 adapter-only `mm_projector.bin` (llava_trainer.py:256-275) —
      kept byte-compatible via torch.save/torch.load so reference checkpoints
      interchange;
  (b/c) full state — orbax (the TPU-native answer to ZeRO partitioned saves:
      orbax writes shard-parallel from a sharded pytree, no gather needed).

Auto-resume matches train/train.py:527-530: if the output dir contains
`checkpoint-*`, training restarts from the newest one.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(output_dir: str, step: int, state) -> str:
    """Save a full TrainState under output_dir/checkpoint-<step> (blocking:
    auto-resume may read it back immediately)."""
    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}"))
    ckpt = _checkpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        m = re.match(r"^checkpoint-(\d+)$", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(output_dir, name), int(m.group(1))
    return os.path.abspath(best) if best else None


def restore_checkpoint(path: str, template_state):
    """Restore into the structure/shardings of template_state."""
    return _checkpointer().restore(path, template_state)


def maybe_auto_resume(output_dir: str, template_state) -> Tuple[Any, Optional[str]]:
    path = latest_checkpoint(output_dir)
    if path is None:
        return template_state, None
    return restore_checkpoint(path, template_state), path


# ---------------------------------------------------------------------------
# reference-compatible projector export/import (mm_projector.bin)
# ---------------------------------------------------------------------------

_TREE_PREFIX = "model.mm_projector.tree."


def _tree_key(key_path) -> str:
    """Stable dotted key for a pytree leaf path (dict keys / list indices)."""
    parts = []
    for entry in key_path:
        if hasattr(entry, "key"):
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):
            parts.append(str(entry.idx))
        else:  # pragma: no cover - future jax key types
            parts.append(str(entry))
    return ".".join(parts)


def save_mm_projector(path: str, projector_params, projector_type: str = "mlp2x_gelu"):
    """Write a reference-layout mm_projector.bin (torch state dict with
    'model.mm_projector.image_spatial_proj.<i>.{weight,bias}' keys).

    linear / mlpNx_gelu use the reference's exact nn.Sequential key naming
    (interchange with llava_trainer.py:256-275 checkpoints); qformer types
    use the reference Blip2Model submodule keys (qformer.py:9-24, verified
    against transformers' Blip2QFormerModel in tests/test_projectors_s2.py).
    pool/simple types — reference-module-specific — are stored under a
    stable 'model.mm_projector.tree.<path>' flattening of our param tree and
    round-trip through load_mm_projector(..., template=...)."""
    import torch

    state = {}
    if re.match(r"^(cheap_)?qformer\d+_\d+$", projector_type):
        from llavamod_tpu.interop.hf import projector_params_to_hf

        arrays = projector_params_to_hf(projector_params, projector_type)
        state = {k: torch.tensor(np.asarray(v).copy())
                 for k, v in arrays.items()}
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        torch.save(state, path)
        return path
    if projector_type == "linear":
        state["model.mm_projector.image_spatial_proj.weight"] = torch.tensor(
            np.asarray(projector_params["kernel"]).T.copy())
        state["model.mm_projector.image_spatial_proj.bias"] = torch.tensor(
            np.asarray(projector_params["bias"]).copy())
    elif re.match(r"^mlp\d+x_gelu$", projector_type):
        for j, layer in enumerate(projector_params["layers"]):
            idx = j * 2  # nn.Sequential: Linear, GELU, Linear, ...
            prefix = f"model.mm_projector.image_spatial_proj.{idx}"
            state[prefix + ".weight"] = torch.tensor(
                np.asarray(layer["kernel"]).T.copy())
            state[prefix + ".bias"] = torch.tensor(
                np.asarray(layer["bias"]).copy())
    else:
        flat = jax.tree_util.tree_flatten_with_path(projector_params)[0]
        for key_path, leaf in flat:
            state[_TREE_PREFIX + _tree_key(key_path)] = torch.tensor(
                np.asarray(leaf).copy())
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(state, path)
    return path


def load_mm_projector(path: str, projector_type: str = "mlp2x_gelu",
                      template=None):
    """Read an mm_projector.bin into our param layout.

    Reference linear/mlpNx checkpoints need no template; tree-flattened
    checkpoints (qformer/pool/simple) need `template` = a freshly-initialized
    projector param tree providing the structure to fill."""
    import torch

    from llavamod_tpu.interop.hf import projector_params_from_hf

    state = torch.load(path, map_location="cpu", weights_only=True)
    if any(k.startswith(_TREE_PREFIX) for k in state):
        if template is None:
            raise ValueError(
                f"mm_projector.bin for '{projector_type}' uses the tree "
                "layout; pass template= (an initialized projector tree)")
        import jax.numpy as jnp

        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for key_path, leaf in flat:
            t = np.asarray(state[_TREE_PREFIX + _tree_key(key_path)])
            if not hasattr(leaf, "dtype"):  # python scalar leaf (bool flag)
                leaves.append(type(leaf)(t.item()))
                continue
            arr = jnp.asarray(t, dtype=leaf.dtype)
            if arr.shape != leaf.shape:
                raise ValueError(f"shape mismatch at {_tree_key(key_path)}: "
                                 f"{arr.shape} vs template {leaf.shape}")
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return projector_params_from_hf(state, projector_type)
