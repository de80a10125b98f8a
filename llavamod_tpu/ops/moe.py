"""Sparse Mixture-of-Experts ops: top-k gating and expert FFN dispatch.

Replaces `deepspeed.moe.layer.MoE` (reference llava_qwen1_5_moe.py:534-546 and
SURVEY.md §2.9) with a TPU-native design:

  * gating — softmax router, top-k expert choice, capacity-factor token
    dropping with cumulative-position bookkeeping, renormalized combine
    weights, and the load-balance auxiliary loss.  Semantics follow
    DeepSpeed's top1gating/top2gating so training behavior matches:
      - capacity = max(min_capacity, ceil(tokens/E * capacity_factor * k))
      - second-choice tokens are placed after all first-choice tokens
        within an expert (DeepSpeed's `locations2 += sum(mask1)`)
      - aux loss: top-1: E * sum(me*ce); top-k>=2: E^2 * mean(me*ce)
  * dispatch/combine — one-hot einsum contraction [S,E,C].  Under a mesh
    with tokens sharded on 'data' and experts on 'expert', GSPMD lowers the
    two einsums to ICI all-to-alls — no hand-written NCCL-style collectives.

Everything is shape-static and jit/grad-safe; the router runs in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GatingConfig:
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.5      # train (reference args.py:46)
    eval_capacity_factor: float = 2.0  # eval (reference args.py:48)
    min_capacity: int = 4              # reference args.py:50
    router_jitter: float = 0.0         # optional multiplicative input jitter
    deterministic_capacity: Optional[int] = None  # fixed capacity override

    def capacity(self, num_tokens: int, train: bool) -> int:
        if self.deterministic_capacity is not None:
            return self.deterministic_capacity
        f = self.capacity_factor if train else self.eval_capacity_factor
        cap = int(-(-num_tokens * f * self.top_k // self.num_experts))
        return max(cap, self.min_capacity)


class GatingOutput(NamedTuple):
    dispatch: jnp.ndarray   # [S, E, C] float (0/1) — token -> slot
    combine: jnp.ndarray    # [S, E, C] float — renormalized gate weights
    aux_loss: jnp.ndarray   # scalar load-balance loss
    expert_load: jnp.ndarray  # [E] fraction of tokens whose top-1 is expert e
    router_probs: jnp.ndarray  # [S, E] softmax gate probabilities


def top_k_gating(
    router_logits: jnp.ndarray,
    cfg: GatingConfig,
    *,
    train: bool = True,
    token_valid: Optional[jnp.ndarray] = None,
) -> GatingOutput:
    """router_logits: [S, E] (any float dtype; computed in fp32 here).

    token_valid: optional [S] bool — padding tokens neither claim capacity
    nor contribute to the aux loss.
    """
    s, e = router_logits.shape
    k = cfg.top_k
    cap = cfg.capacity(s, train)

    gates = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)  # [S, E]
    if token_valid is None:
        valid_f = jnp.ones((s,), jnp.float32)
    else:
        valid_f = token_valid.astype(jnp.float32)

    remaining = gates
    masks = []      # k x [S, E] one-hot choice masks (before capacity)
    gate_vals = []  # k x [S] chosen gate probs
    for _ in range(k):
        idx = jnp.argmax(remaining, axis=-1)
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32) * valid_f[:, None]
        masks.append(onehot)
        gate_vals.append(jnp.sum(gates * onehot, axis=-1))
        remaining = jnp.where(onehot > 0, -jnp.inf, remaining)

    # Load-balance loss from the pre-drop top-1 assignment (DeepSpeed parity).
    me = jnp.sum(gates * valid_f[:, None], axis=0) / jnp.maximum(jnp.sum(valid_f), 1.0)
    ce = jnp.sum(masks[0], axis=0) / jnp.maximum(jnp.sum(valid_f), 1.0)
    if k == 1:
        aux = jnp.sum(me * ce) * e
    else:
        aux = jnp.mean(me * ce) * e * e

    # Capacity assignment: choice-1 tokens fill expert slots first, then
    # choice-2, etc.  Position within an expert = running count of earlier
    # tokens with that expert across all earlier choices.
    prior = jnp.zeros((e,), jnp.float32)
    kept_masks = []
    locations = []
    for choice in range(k):
        m = masks[choice]
        loc = jnp.cumsum(m, axis=0) - m + prior[None, :]  # exclusive cumsum
        keep = m * (loc < cap)
        kept_masks.append(keep)
        locations.append(loc)
        prior = prior + jnp.sum(m, axis=0)

    # Renormalize combine weights over the experts that survived the drop.
    # k == 1 keeps the raw gate probability (DeepSpeed top1gating does not
    # renormalize; top2gating does).
    kept_gate = [gate_vals[c] * jnp.sum(kept_masks[c], axis=-1) for c in range(k)]
    if k == 1:
        denom = jnp.ones_like(kept_gate[0])
    else:
        denom = sum(kept_gate)
        denom = jnp.maximum(denom, jnp.finfo(jnp.float32).eps)

    combine = jnp.zeros((s, e, cap), jnp.float32)
    dispatch = jnp.zeros((s, e, cap), jnp.float32)
    for c in range(k):
        pos = jnp.sum(locations[c] * kept_masks[c], axis=-1)  # [S]
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), cap, dtype=jnp.float32)
        w = (kept_gate[c] / denom)[:, None, None]
        contrib = kept_masks[c][:, :, None] * pos_oh[:, None, :]
        combine = combine + w * contrib
        dispatch = dispatch + contrib

    return GatingOutput(jax.lax.stop_gradient(dispatch), combine, aux, ce, gates)


def moe_ffn(
    x: jnp.ndarray,
    dispatch: jnp.ndarray,
    combine: jnp.ndarray,
    expert_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Route tokens through experts via dense one-hot contractions.

    x: [S, D]; dispatch/combine: [S, E, C];
    expert_fn: vmapped-over-experts FFN, maps [E, C, D] -> [E, C, D].
    """
    xe = jnp.einsum("sec,sd->ecd", dispatch.astype(x.dtype), x)
    ye = expert_fn(xe)
    return jnp.einsum("sec,ecd->sd", combine.astype(ye.dtype), ye)
