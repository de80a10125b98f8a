"""Per-block Adafactor as pure leaf functions (for the fused update path).

The standard optimizer path (train/optim.py) uses optax.adafactor over the
whole param tree — which requires the full gradient tree to be resident.
The fused backward (train/fused_steps.py) instead applies the update
per layer-repeat INSIDE the backward scan, so it needs the update rule as
a pure (param, grad, state, count, lr) -> (param', state') function that
can be mapped over one repeat's leaves at a time.

Semantics mirror optax.adafactor (optax/_src/factorized.py::
scale_by_factored_rms + clip_by_block_rms + lr + scale_by_param_block_rms,
Shazeer & Stern 2018) with one deliberate difference: the "block" for
update clipping and parameter-scale is one LAYER'S matrix (a [..] slice of
the stacked [reps, ..] leaf), not the whole stacked leaf — i.e. exactly
the per-weight-matrix blocks of the original paper, which the stacked scan
layout would otherwise merge.  tests/test_fused_align.py pins both the
leaf-rule parity vs optax and the end-to-end fused-step parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Any

_EPS = 1e-30          # optax adafactor eps (regularizer on grad^2)
_MIN_PARAM_SCALE = 1e-3  # optax scale_by_param_block_rms min_scale
_MIN_DIM_TO_FACTOR = 128


def _factored_dims(shape) -> Optional[Tuple[int, int]]:
    """The two largest axes to reduce over, or None (optax's rule)."""
    if len(shape) < 2:
        return None
    sorted_dims = np.argsort(shape)
    if shape[sorted_dims[-2]] < _MIN_DIM_TO_FACTOR:
        return None
    return int(sorted_dims[-2]), int(sorted_dims[-1])


def init_leaf(param: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Factored state for one leaf: {'v_row','v_col'} or {'v'} (fp32)."""
    fd = _factored_dims(param.shape)
    if fd is not None:
        d1, d0 = fd
        return {
            "v_row": jnp.zeros(tuple(np.delete(param.shape, d0)), jnp.float32),
            "v_col": jnp.zeros(tuple(np.delete(param.shape, d1)), jnp.float32),
        }
    return {"v": jnp.zeros(param.shape, jnp.float32)}


def update_leaf(param: jnp.ndarray, grad: jnp.ndarray,
                state: Dict[str, jnp.ndarray], count: jnp.ndarray,
                lr, *, decay_rate: float = 0.8,
                clipping_threshold: float = 1.0,
                multiply_by_parameter_scale: bool = True,
                weight_decay_rate: Optional[float] = None):
    """One Adafactor step for one leaf. Returns (new_param, new_state).

    All statistics/updates in fp32 regardless of param dtype (the stacked
    flagship masters are bf16; fp32 state costs ~(rows+cols) per matrix).
    """
    g = grad.astype(jnp.float32)
    p32 = param.astype(jnp.float32)
    decay_rate_t = 1.0 - (count.astype(jnp.float32) + 1.0) ** (-decay_rate)

    fd = _factored_dims(param.shape)
    new_state = {}
    grad_sqr = g * g + _EPS
    if fd is not None:
        d1, d0 = fd
        new_v_row = (decay_rate_t * state["v_row"]
                     + (1.0 - decay_rate_t) * jnp.mean(grad_sqr, axis=d0))
        new_v_col = (decay_rate_t * state["v_col"]
                     + (1.0 - decay_rate_t) * jnp.mean(grad_sqr, axis=d1))
        new_state["v_row"], new_state["v_col"] = new_v_row, new_v_col
        reduced_d1 = d1 - 1 if d1 > d0 else d1
        row_col_mean = jnp.mean(new_v_row, axis=reduced_d1, keepdims=True)
        row_factor = (new_v_row / row_col_mean) ** -0.5
        col_factor = new_v_col ** -0.5
        update = (g * jnp.expand_dims(row_factor, axis=d0)
                  * jnp.expand_dims(col_factor, axis=d1))
    else:
        new_v = decay_rate_t * state["v"] + (1.0 - decay_rate_t) * grad_sqr
        new_state["v"] = new_v
        update = g * new_v ** -0.5

    if clipping_threshold is not None:
        clip_denom = jnp.maximum(
            1.0, jnp.sqrt(jnp.mean(update * update)) / clipping_threshold)
        update = update / clip_denom
    update = update * lr
    if multiply_by_parameter_scale:
        scale = jnp.maximum(jnp.sqrt(jnp.mean(p32 * p32)), _MIN_PARAM_SCALE)
        update = update * scale
    if weight_decay_rate:
        update = update + weight_decay_rate * p32
    return (p32 - update).astype(param.dtype), new_state


def init_tree(params: Params, mask: Params) -> Params:
    """State tree: init_leaf where mask is True, {} where frozen."""
    return jax.tree_util.tree_map(
        lambda p, m: init_leaf(p) if m else {}, params, mask)


def update_tree(params: Params, grads: Params, states: Params, mask: Params,
                count: jnp.ndarray, lr, **kw) -> Tuple[Params, Params]:
    """Masked tree update.  Frozen leaves pass through untouched (their
    grads may be float0 from int8 custom_vjps — never inspected)."""
    is_state = lambda s: isinstance(s, dict) and (  # noqa: E731
        not s or "v" in s or "v_row" in s)
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_s = treedef.flatten_up_to(states)
    flat_m = jax.tree_util.tree_leaves(mask)
    assert len(flat_p) == len(flat_g) == len(flat_s) == len(flat_m)
    new_p, new_s = [], []
    for p, g, s, m in zip(flat_p, flat_g, flat_s, flat_m):
        if not m:
            new_p.append(p)
            new_s.append(s)
            continue
        assert is_state(s) and s, "trainable leaf without adafactor state"
        np_, ns = update_leaf(p, g, s, count, lr, **kw)
        new_p.append(np_)
        new_s.append(ns)
    return (jax.tree_util.tree_unflatten(treedef, new_p),
            jax.tree_util.tree_unflatten(treedef, new_s))
