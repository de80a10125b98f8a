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


class CompactGating(NamedTuple):
    """Index/weight form of the same assignment (for gather dispatch).
    The static capacity is NOT carried here (kept vmap-friendly) — callers
    recover it via GatingConfig.capacity(group_tokens, train)."""
    expert: jnp.ndarray       # [S, k] int32 — chosen expert per choice
    slot: jnp.ndarray         # [S, k] int32 — capacity slot within expert
    weight: jnp.ndarray       # [S, k] fp32 — renormalized gate (0 if dropped)
    kept: jnp.ndarray         # [S, k] bool — survived the capacity drop
    aux_loss: jnp.ndarray     # scalar
    expert_load: jnp.ndarray  # [E]
    router_probs: jnp.ndarray  # [S, E]


def _gating_core(router_logits, cfg: GatingConfig, train: bool, token_valid):
    """Shared top-k + capacity bookkeeping (DeepSpeed top1/top2 semantics)."""
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

    return dict(masks=masks, kept_masks=kept_masks, locations=locations,
                kept_gate=kept_gate, denom=denom, aux=aux, ce=ce,
                gates=gates, cap=cap, k=k, s=s, e=e)


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
    g = _gating_core(router_logits, cfg, train, token_valid)
    s, e, cap, k = g["s"], g["e"], g["cap"], g["k"]

    combine = jnp.zeros((s, e, cap), jnp.float32)
    dispatch = jnp.zeros((s, e, cap), jnp.float32)
    for c in range(k):
        pos = jnp.sum(g["locations"][c] * g["kept_masks"][c], axis=-1)  # [S]
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), cap, dtype=jnp.float32)
        w = (g["kept_gate"][c] / g["denom"])[:, None, None]
        contrib = g["kept_masks"][c][:, :, None] * pos_oh[:, None, :]
        combine = combine + w * contrib
        dispatch = dispatch + contrib

    return GatingOutput(jax.lax.stop_gradient(dispatch), combine, g["aux"],
                        g["ce"], g["gates"])


def top_k_gating_compact(
    router_logits: jnp.ndarray,
    cfg: GatingConfig,
    *,
    train: bool = True,
    token_valid: Optional[jnp.ndarray] = None,
) -> CompactGating:
    """Same assignment as top_k_gating, in index/weight form: O(S*k) data
    instead of the [S, E, C] one-hots, consumed by moe_ffn_gather."""
    g = _gating_core(router_logits, cfg, train, token_valid)
    k = g["k"]
    expert = jnp.stack(
        [jnp.argmax(g["masks"][c], axis=-1).astype(jnp.int32)
         for c in range(k)], axis=1)                              # [S, k]
    slot = jnp.stack(
        [jnp.sum(g["locations"][c] * g["kept_masks"][c],
                 axis=-1).astype(jnp.int32) for c in range(k)], axis=1)
    kept = jnp.stack(
        [jnp.sum(g["kept_masks"][c], axis=-1) > 0 for c in range(k)], axis=1)
    weight = jnp.stack(
        [g["kept_gate"][c] / g["denom"] for c in range(k)], axis=1)
    weight = weight * kept.astype(weight.dtype)
    return CompactGating(jax.lax.stop_gradient(expert),
                         jax.lax.stop_gradient(slot),
                         weight, jax.lax.stop_gradient(kept),
                         g["aux"], g["ce"], g["gates"])


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


def moe_ffn_gather(
    x: jnp.ndarray,
    gating: CompactGating,
    num_experts: int,
    capacity: int,
    expert_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Same routing as moe_ffn, via gather/scatter instead of one-hot
    einsums: the dispatch einsum costs O(S*E*C*D) MXU work, this moves
    O(E*C*D) bytes.  Numerically identical assignment (same drops, same
    renormalized weights; combine accumulates in fp32).

    x: [S, D]; gating: CompactGating from top_k_gating_compact.
    """
    s, d = x.shape
    e, cap = num_experts, capacity
    k = gating.expert.shape[1]

    flat = gating.expert * cap + gating.slot                 # [S, k]
    flat = jnp.where(gating.kept, flat, e * cap)             # dropped -> OOB
    flat_1d = flat.reshape(s * k)
    token_ids = jnp.repeat(jnp.arange(s, dtype=jnp.int32), k)
    # slot -> source token (distinct (expert, slot) per kept token by
    # construction, so no scatter collisions; OOB rows are dropped)
    src = jnp.zeros((e * cap,), jnp.int32).at[flat_1d].set(
        token_ids, mode="drop")
    filled = jnp.zeros((e * cap,), jnp.bool_).at[flat_1d].set(
        True, mode="drop")

    xe = jnp.where(filled[:, None], jnp.take(x, src, axis=0), 0)
    ye = expert_fn(xe.reshape(e, cap, d)).reshape(e * cap, d)

    picked = jnp.take(ye, jnp.minimum(flat, e * cap - 1).reshape(s * k),
                      axis=0).reshape(s, k, d)
    w = gating.weight.astype(jnp.float32)[..., None]         # 0 for dropped
    y = jnp.sum(picked.astype(jnp.float32) * w, axis=1)
    return y.astype(x.dtype)


def _ragged_rows(expert, slot, kept, counts, offsets, m):
    """Shared tail of the ragged layouts: map each kept (token, choice) to
    its compacted row `offsets[expert] + slot` (dropped -> OOB m), and build
    the row -> source-token gather index."""
    r = offsets[expert] + slot
    r = jnp.where(kept, r, m)                                 # [S, k]
    flat = r.reshape(-1)
    s, k = expert.shape
    token_ids = jnp.repeat(jnp.arange(s, dtype=jnp.int32), k)
    src = jnp.zeros((m,), jnp.int32).at[flat].set(token_ids, mode="drop")
    filled = jnp.zeros((m,), jnp.bool_).at[flat].set(True, mode="drop")
    return r, src, filled


def moe_ffn_ragged(
    x: jnp.ndarray,
    gating: CompactGating,
    num_experts: int,
    capacity: int,
    expert_fn_ragged: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Same routing as moe_ffn_gather, but the experts run as a RAGGED
    (grouped) matmul over only the kept rows instead of the capacity-padded
    [E, C, D] batch: E*C = capacity_factor*k*S rows of padded MXU work become
    <= S*k useful rows (a 1/capacity_factor FLOP cut at the recipe's 1.5).

    Key fact making this O(S*k) layout exact: within an expert, kept slots
    are assigned by exclusive cumsum (choice-major), so they are contiguous
    0..count_e-1 — compacting to `offsets[e] + slot` yields the contiguous
    expert-major row blocks `lax.ragged_dot` requires, with group_sizes =
    per-expert kept counts.  Identical drops and combine weights.

    x: [S, D]; expert_fn_ragged: ([M, D], group_sizes [E]) -> [M, D].
    """
    s, d = x.shape
    k = gating.expert.shape[1]
    m = min(s * k, num_experts * capacity)

    kept_i = gating.kept.astype(jnp.int32)
    counts = jnp.zeros((num_experts,), jnp.int32).at[
        gating.expert.reshape(-1)].add(kept_i.reshape(-1), mode="drop")
    offsets = jnp.cumsum(counts) - counts                      # exclusive
    r, src, filled = _ragged_rows(gating.expert, gating.slot, gating.kept,
                                  counts, offsets, m)

    xr = jnp.where(filled[:, None], jnp.take(x, src, axis=0), 0)
    yr = expert_fn_ragged(xr, counts)

    picked = jnp.take(yr, jnp.minimum(r, m - 1).reshape(s * k),
                      axis=0).reshape(s, k, d)
    picked = jnp.where(gating.kept[..., None], picked, 0)      # no NaN leak
    w = gating.weight.astype(jnp.float32)[..., None]
    y = jnp.sum(picked.astype(jnp.float32) * w, axis=1)
    return y.astype(x.dtype)


def moe_ffn_ragged_grouped(
    x: jnp.ndarray,
    gating: CompactGating,
    num_experts: int,
    capacity: int,
    group: int,
    expert_fn_ragged: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Ragged dispatch for per-group gating (fields [G, group, k]): each
    expert's row block is the group-major concatenation of every group's
    kept rows for that expert (slot offsets chain per-group counts), so one
    ragged matmul covers all groups.  x: [G*group, D] -> [G*group, D]."""
    s, d = x.shape
    e = num_experts
    g_n, grp, k = gating.expert.shape
    assert g_n * grp == s, (gating.expert.shape, s)
    m = min(s * k, e * g_n * capacity)

    kept_i = gating.kept.astype(jnp.int32)                     # [G, grp, k]
    # per-(group, expert) kept counts -> within-expert group bases
    counts_ge = jnp.zeros((g_n, e), jnp.int32).at[
        jnp.arange(g_n, dtype=jnp.int32)[:, None, None],
        gating.expert].add(kept_i, mode="drop")
    counts = jnp.sum(counts_ge, axis=0)                        # [E]
    offsets = jnp.cumsum(counts) - counts
    base_ge = jnp.cumsum(counts_ge, axis=0) - counts_ge        # [G, E]

    g_idx = jnp.arange(g_n, dtype=jnp.int32)[:, None, None]
    slot = base_ge[g_idx, gating.expert] + gating.slot         # [G, grp, k]
    r, src, filled = _ragged_rows(
        gating.expert.reshape(s, k), slot.reshape(s, k),
        gating.kept.reshape(s, k), counts, offsets, m)

    xr = jnp.where(filled[:, None], jnp.take(x, src, axis=0), 0)
    yr = expert_fn_ragged(xr, counts)

    picked = jnp.take(yr, jnp.minimum(r, m - 1).reshape(s * k),
                      axis=0).reshape(s, k, d)
    picked = jnp.where(gating.kept.reshape(s, k)[..., None], picked, 0)
    w = gating.weight.astype(jnp.float32).reshape(s, k)[..., None]
    y = jnp.sum(picked.astype(jnp.float32) * w, axis=1)
    return y.astype(x.dtype)


def moe_ffn_gather_grouped(
    x: jnp.ndarray,
    gating: CompactGating,
    num_experts: int,
    capacity: int,
    group: int,
    expert_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Gather dispatch for per-group gating (vmapped top_k_gating_compact):
    gating fields are [G, group, k]; every expert sees the concatenation of
    all groups' capacity rows ([E, G*C, D]), matching _grouped_moe's layout.

    x: [G*group, D].  Returns [G*group, D]."""
    s, d = x.shape
    e, cap = num_experts, capacity
    g_n, grp, k = gating.expert.shape
    assert g_n * grp == s, (gating.expert.shape, s)
    rows = g_n * cap  # capacity rows per expert across groups

    g_idx = jnp.arange(g_n, dtype=jnp.int32)[:, None, None]
    flat = gating.expert * rows + g_idx * cap + gating.slot   # [G, grp, k]
    flat = jnp.where(gating.kept, flat, e * rows)             # dropped -> OOB
    flat_1d = flat.reshape(-1)
    token_ids = jnp.broadcast_to(
        (g_idx * grp + jnp.arange(grp, dtype=jnp.int32)[None, :, None]),
        flat.shape).reshape(-1)
    src = jnp.zeros((e * rows,), jnp.int32).at[flat_1d].set(
        token_ids, mode="drop")
    filled = jnp.zeros((e * rows,), jnp.bool_).at[flat_1d].set(
        True, mode="drop")

    xe = jnp.where(filled[:, None], jnp.take(x, src, axis=0), 0)
    ye = expert_fn(xe.reshape(e, rows, d)).reshape(e * rows, d)

    picked = jnp.take(ye, jnp.minimum(flat, e * rows - 1).reshape(-1),
                      axis=0).reshape(s, k, d)
    w = gating.weight.astype(jnp.float32).reshape(s, k)[..., None]
    y = jnp.sum(picked.astype(jnp.float32) * w, axis=1)
    return y.astype(x.dtype)
