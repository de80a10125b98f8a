"""Sparse upcycling: convert a dense student into a top-k MoE.

Functional equivalent of the reference's `initialize_moe_modules`
(llava_qwen1_5_moe.py:475-561), which swaps each selected layer's `mlp` for a
DeepSpeed MoE wrapping copies of the dense MLP, then monkey-patches every
forward.  Here it is a pure param-tree transform:

    cfg', params' = upcycle(cfg, params, moe_mode=..., num_experts=4, ...)

Every expert starts as an exact copy of the dense FFN weights (the true
"upcycling" invariant the reference asserts at :547-550, verified by
tests/test_upcycle.py), and the router is zero-initialized so initial routing
is uniform.  No monkey-patching: the decoder forward reads cfg.moe_layers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from llavamod_tpu.models.llm.config import DecoderConfig


def moe_layer_indices(moe_mode: str, num_layers: int,
                      explicit: Optional[Sequence[int]] = None) -> Tuple[int, ...]:
    """Layer selection per moe_mode (reference llava_qwen1_5_moe.py:510-529)."""
    if explicit is not None:
        assert len(explicit) <= num_layers
        assert max(explicit) < num_layers and min(explicit) >= 0
        return tuple(explicit)
    if moe_mode == "first_half":
        return tuple(range(num_layers // 2))
    if moe_mode == "second_half":
        return tuple(range(num_layers // 2, num_layers))
    if moe_mode == "sparse":
        return tuple(range(num_layers))[::2]
    if moe_mode == "dense":
        return tuple(range(num_layers))
    raise NotImplementedError(
        f'moe_mode must be one of ["first_half", "second_half", "sparse", '
        f'"dense"], got {moe_mode}')


def upcycle(
    cfg: DecoderConfig,
    params,
    *,
    moe_mode: str = "sparse",
    moe_layers_idx: Optional[Sequence[int]] = None,
    num_experts: int = 4,
    top_k: int = 2,
    capacity_factor: float = 1.5,
    eval_capacity_factor: float = 2.0,
    min_capacity: int = 4,
    use_residual: bool = False,
    router_aux_loss_coef: float = 0.01,
):
    """Returns (moe_cfg, moe_params).  `params` is not mutated."""
    layers_idx = moe_layer_indices(moe_mode, cfg.num_layers, moe_layers_idx)
    moe_cfg = cfg.replace(
        moe_num_experts=num_experts,
        moe_top_k=top_k,
        moe_capacity_factor=capacity_factor,
        moe_eval_capacity_factor=eval_capacity_factor,
        moe_min_capacity=min_capacity,
        moe_layers=layers_idx,
        moe_use_residual=use_residual,
        router_aux_loss_coef=router_aux_loss_coef,
    )

    def replicate(w):
        return jnp.repeat(w[None], num_experts, axis=0)

    new_params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    new_layers = []
    for i, layer in enumerate(params["layers"]):
        layer = dict(layer)
        if i in layers_idx:
            dense_mlp = layer["mlp"]
            experts = {k: replicate(v) for k, v in dense_mlp.items()}
            moe_mlp = {
                "router": jnp.zeros((cfg.hidden_size, num_experts),
                                    dense_mlp["up"].dtype),
                "experts": experts,
            }
            if use_residual:
                moe_mlp["residual_mlp"] = jax.tree_util.tree_map(
                    lambda x: x, dense_mlp)
                moe_mlp["coef"] = jnp.zeros((cfg.hidden_size, 2),
                                            dense_mlp["up"].dtype)
            layer["mlp"] = moe_mlp
        new_layers.append(layer)
    new_params["layers"] = new_layers
    return moe_cfg, new_params


def activated_params(cfg: DecoderConfig) -> int:
    """Closed-form activated-parameter count for a (possibly MoE) decoder —
    parity with scripts/activated_params.py:1-24."""
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    h, kh, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    attn = d * h * dh + 2 * d * kh * dh + h * dh * d
    if cfg.qkv_bias:
        attn += h * dh + 2 * kh * dh
    mlp_dense = (3 if cfg.gated_mlp else 2) * d * f
    norms = 2 * d
    per_layer_dense = attn + mlp_dense + norms
    total = 0
    for i in range(cfg.num_layers):
        total += per_layer_dense
        if cfg.is_moe and i in cfg.moe_layers:
            # activated experts = top_k copies instead of 1, plus the router
            total += (cfg.moe_top_k - 1) * mlp_dense + d * cfg.moe_num_experts
    total += d  # final norm
    total += v * d  # embedding
    if not cfg.tie_word_embeddings:
        total += v * d
    return total
