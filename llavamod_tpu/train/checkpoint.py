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

def save_mm_projector(path: str, projector_params, projector_type: str = "mlp2x_gelu"):
    """Write a reference-layout mm_projector.bin (torch state dict with
    'model.mm_projector.image_spatial_proj.<i>.{weight,bias}' keys)."""
    import torch

    state = {}
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
        raise NotImplementedError(projector_type)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(state, path)
    return path


def load_mm_projector(path: str, projector_type: str = "mlp2x_gelu"):
    """Read a reference mm_projector.bin into our param layout."""
    import torch

    from llavamod_tpu.interop.hf import projector_params_from_hf

    state = torch.load(path, map_location="cpu", weights_only=True)
    return projector_params_from_hf(state, projector_type)
