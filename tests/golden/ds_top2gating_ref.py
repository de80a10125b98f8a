"""Torch reference transcription of DeepSpeed-MoE's top-1/top-2 gating.

DeepSpeed itself is not installable in this image (zero egress), so this is
a line-by-line transcription of the algorithm of `deepspeed.moe.sharded_moe
.top1gating/top2gating` (the layer the reference wraps at
llava_qwen1_5_moe.py:534-546) — the capacity formula, the
place-second-choices-after-first-choices location bookkeeping, the
pre-drop top-1 aux loss, and the post-drop combine renormalization — used
as the golden oracle for llavamod_tpu.ops.moe.top_k_gating.

Kept in torch so the two implementations share no code or framework.
"""

import math

import torch
import torch.nn.functional as F


def _capacity(num_tokens: int, num_experts: int, capacity_factor: float,
              min_capacity: int) -> int:
    capacity = math.ceil((num_tokens / num_experts) * capacity_factor)
    return max(capacity, min_capacity)


@torch.no_grad()
def top2gating(logits: torch.Tensor, capacity_factor: float,
               min_capacity: int):
    """logits [S, E] -> (l_aux, combine [S,E,C], dispatch [S,E,C] bool)."""
    s, e = logits.shape
    gates = F.softmax(logits.float(), dim=1)

    capacity = _capacity(s, e, capacity_factor * 2, min_capacity)

    indices1_s = torch.argmax(gates, dim=1)
    mask1 = F.one_hot(indices1_s, num_classes=e).float()

    logits_except1 = logits.float().masked_fill(mask1.bool(), float("-inf"))
    indices2_s = torch.argmax(logits_except1, dim=1)
    mask2 = F.one_hot(indices2_s, num_classes=e).float()

    locations1 = torch.cumsum(mask1, dim=0) - 1
    locations2 = torch.cumsum(mask2, dim=0) - 1
    # second choices queue behind every first choice of the same expert
    locations2 += torch.sum(mask1, dim=0, keepdim=True)

    # aux loss on the pre-drop top-1 assignment
    me = torch.mean(gates, dim=0)
    ce = torch.mean(mask1, dim=0)
    l_aux = torch.mean(me * ce) * e * e

    # capacity dropping
    mask1 = mask1 * torch.lt(locations1, capacity).float()
    mask2 = mask2 * torch.lt(locations2, capacity).float()

    locations1_s = torch.sum(locations1 * mask1, dim=1)
    locations2_s = torch.sum(locations2 * mask2, dim=1)

    gates1_s = torch.einsum("se,se->s", gates, mask1)
    gates2_s = torch.einsum("se,se->s", gates, mask2)
    denom_s = gates1_s + gates2_s
    denom_s = torch.clamp(denom_s, min=torch.finfo(denom_s.dtype).eps)
    gates1_s = gates1_s / denom_s
    gates2_s = gates2_s / denom_s

    gates1 = gates1_s.unsqueeze(-1) * mask1
    gates2 = gates2_s.unsqueeze(-1) * mask2
    locations1_sc = F.one_hot(locations1_s.long(), num_classes=capacity).float()
    locations2_sc = F.one_hot(locations2_s.long(), num_classes=capacity).float()
    combine1_sec = torch.einsum("se,sc->sec", gates1, locations1_sc)
    combine2_sec = torch.einsum("se,sc->sec", gates2, locations2_sc)
    combine_weights = combine1_sec + combine2_sec
    dispatch_mask = combine_weights.bool()
    return l_aux, combine_weights, dispatch_mask, capacity


@torch.no_grad()
def top1gating(logits: torch.Tensor, capacity_factor: float,
               min_capacity: int):
    """Greedy top-1 variant (deepspeed top1gating, no noise/RTS)."""
    s, e = logits.shape
    gates = F.softmax(logits.float(), dim=1)
    capacity = _capacity(s, e, capacity_factor, min_capacity)

    indices1_s = torch.argmax(gates, dim=1)
    mask1 = F.one_hot(indices1_s, num_classes=e).float()

    locations1 = torch.cumsum(mask1, dim=0) - 1

    me = torch.mean(gates, dim=0)
    ce = torch.mean(mask1, dim=0)
    l_aux = torch.sum(me * ce) * e

    mask1 = mask1 * torch.lt(locations1, capacity).float()
    locations1_s = torch.sum(locations1 * mask1, dim=1)

    gates1_s = torch.einsum("se,se->s", gates, mask1)
    # deepspeed top1 does NOT renormalize (single expert keeps its prob)
    locations1_sc = F.one_hot(locations1_s.long(), num_classes=capacity).float()
    combine_weights = torch.einsum("se,sc->sec",
                                   gates1_s.unsqueeze(-1) * mask1,
                                   locations1_sc)
    dispatch_mask = combine_weights.bool()
    return l_aux, combine_weights, dispatch_mask, capacity
