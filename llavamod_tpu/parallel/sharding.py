"""Parameter and activation sharding rules.

Path-based rules map every parameter in a param tree to a PartitionSpec.
This replaces the reference's ZeRO JSON configs + DeepSpeed engine wrapping
(SURVEY.md §2.9): sharding is declared once, XLA/GSPMD inserts the
collectives (all-gather for fsdp params, psum for grads, all-to-all for the
expert einsums).

Default layout (row = param, axes = (data, fsdp, expert, tensor)):

  embedding / lm_head [V, D]        -> ((tensor, fsdp), None)  # vocab-dim
  attn in-proj  [D, H*dh]           -> (fsdp, tensor)
  attn out-proj [H*dh, D]           -> (tensor, fsdp)
  mlp in  [D, F]                    -> (fsdp, tensor)
  mlp out [F, D]                    -> (tensor, fsdp)
  moe experts [E, ...]              -> ('expert',) + dense rule
  router [D, E]                     -> (fsdp, None)
  norms / biases / small params     -> replicated
  batch activations [B, T, ...]     -> (('data','fsdp'), None, ...)

The teacher (frozen) tree uses the same rules — it is just a second pytree
in the same pjit program (SURVEY.md §5 "distributed communication backend").
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path: str, ndim: int) -> P:
    """Sharding rule lookup by parameter path and rank.

    Pre-stacked layer trees (decoder.stack_layers) carry a leading
    layers-per-period repeat axis ('layers/stacked/{j}/...'): it is sharded
    over the 'pipe' axis (pipeline stages own contiguous repeat blocks;
    parallel/pipeline.py) — identity when pipe=1, where the repeat axis is
    simply scanned over — and the usual rules apply to the trailing dims."""
    is_expert = "/experts/" in path
    is_stacked = "/stacked/" in path
    lead = (["expert"] if is_expert else []) + (["pipe"] if is_stacked else [])
    base_ndim = ndim - len(lead)

    def wrap(spec_dims):
        if is_stacked and is_expert:
            # stacked MoE experts: [reps, E, ...] — reps leads, then expert
            return P("pipe", "expert", *spec_dims)
        return P(*lead, *spec_dims)

    if base_ndim <= 1:
        return wrap([None] * base_ndim)  # norms, biases, scalars

    # --- vocab-carrying matrices: shard the VOCAB dim (Megatron-style),
    # never the feature dim.  Feature-dim (fsdp-on-D) sharding forced the
    # [B, T, D] embedding GRADIENT to reshard batch->feature before its
    # scatter-add whenever the embedding trains — the SPMD "involuntary
    # full rematerialization" warning in the round-2 multichip dryrun.
    if "embedding" in path or "lm_head" in path:
        return wrap([("tensor", "fsdp"), None])

    # --- router: tiny, replicate the expert dim ---
    if path.endswith("router") or path.endswith("coef"):
        return wrap(["fsdp", None])

    # --- attention ---
    if "/attn/" in path or "/self_attn/" in path:
        if "wo" in path or "/o/" in path or path.endswith("o/kernel"):
            return wrap(["tensor", "fsdp"] + [None] * (base_ndim - 2))
        return wrap(["fsdp", "tensor"] + [None] * (base_ndim - 2))

    # --- mlp ---
    if path.endswith("down") or "down/" in path or "fc2" in path:
        return wrap(["tensor", "fsdp"] + [None] * (base_ndim - 2))
    if (path.endswith("gate") or path.endswith("up") or "fc1" in path
            or "gate/" in path or "up/" in path):
        return wrap(["fsdp", "tensor"] + [None] * (base_ndim - 2))

    # --- generic 2D+ (projector kernels, vit patch embed, qformer, ...) ---
    return wrap(["fsdp", None] + [None] * (base_ndim - 2))


def param_specs(params) -> Any:
    """PartitionSpec tree matching `params` structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_str(path), np.ndim(leaf)), params)


def batch_spec(ndim: int, *, seq_sharded: bool = False) -> P:
    """Batch tensors: shard batch dim over (data, fsdp); scalars replicate."""
    if ndim == 0:
        return P()
    dims = [("data", "fsdp")]
    if seq_sharded and ndim > 1:
        dims.append("tensor")
    dims += [None] * (ndim - len(dims))
    return P(*dims)


def fit_spec_to_shape(mesh: Mesh, spec: P, shape) -> P:
    """Drop sharding on dims the mesh doesn't divide (replicate instead).

    Rules are written for production shapes; tiny test models (and odd
    vocab/hidden sizes) fall back dim-by-dim to replication, like GSPMD's
    own requirement that named shardings divide the dim."""
    fitted = []
    for i, axes in enumerate(spec):
        if axes is None:
            fitted.append(None)
            continue
        ax_tuple = axes if isinstance(axes, tuple) else (axes,)
        if any(a not in mesh.shape for a in ax_tuple):
            fitted.append(None)  # mesh lacks the axis: replicate
            continue
        size = int(np.prod([mesh.shape[a] for a in ax_tuple]))
        if i < len(shape) and shape[i] % size == 0:
            fitted.append(axes)
        else:
            fitted.append(None)
    return P(*fitted)


def shard_params(mesh: Mesh, params):
    """Device-put a param tree with its sharding rules applied."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, fit_spec_to_shape(mesh, s, np.shape(x)))),
        params, specs)


def shard_batch(mesh: Mesh, batch, *, multihost: Optional[bool] = None):
    """Device-put a host batch with batch-dim sharding.

    Single-host: a plain device_put.  Multi-host (or multihost=True): each
    process holds only ITS per-process slice of the global batch (fed by a
    ProcessShardSampler-sharded loader) and the global array is assembled
    with jax.make_array_from_process_local_data — the reference gets the
    same per-rank semantics from the deepspeed launcher + sampler world_size
    (llava_trainer.py:62-90)."""
    if multihost is None:
        multihost = jax.process_count() > 1

    def put(x):
        nd = np.ndim(x)
        if not multihost or nd == 0:
            return jax.device_put(x, NamedSharding(
                mesh, fit_spec_to_shape(mesh, batch_spec(nd), np.shape(x))))
        shape = list(np.shape(x))
        shape[0] *= jax.process_count()  # global batch = sum of local slices
        spec = fit_spec_to_shape(mesh, batch_spec(nd), tuple(shape))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x), tuple(shape))

    return jax.tree_util.tree_map(put, batch)
