"""Multimodal projectors: vision features -> LLM embedding space.

Registry + string-spec parser with the same type grammar as the reference
(multimodal_projector/builder.py:26-66):
    'linear' | 'mlp{N}x_gelu' | 'pool_mlp{N}x_gelu' | 'identity'
    | 'qformer{L}_{Q}' | 'cheap_qformer{L}_{Q}'
    | 'simple_in{I}_out{O}' | 'cheap_simple_in{I}_out{O}'
'mlp2x_gelu' is the configuration of record (shells/train/qwen/pretrain.sh:31).

All projectors are functional: (init, apply) pairs over param pytrees.
The pooling variants reduce the 576-token CLIP grid (24x24 -> 12x12 via 2x2
average pooling) before the MLP, matching Pool_Block (pool_block.py:8-27).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


class Projector(NamedTuple):
    """A concrete projector: init(key, dtype) -> params; apply(params, x)."""
    spec: str
    init: Callable
    apply: Callable
    num_output_tokens: Callable[[int], int]  # input tokens -> output tokens


def _dense(key, din, dout, dtype):
    w = jax.random.normal(key, (din, dout), jnp.float32) * (din ** -0.5)
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((dout,), dtype)}


def _apply_dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _mlp_init(key, din, dout, depth, dtype):
    ks = jax.random.split(key, depth)
    layers = [_dense(ks[0], din, dout, dtype)]
    for i in range(1, depth):
        layers.append(_dense(ks[i], dout, dout, dtype))
    return {"layers": layers}


def _mlp_apply(p, x):
    x = _apply_dense(p["layers"][0], x)
    for lp in p["layers"][1:]:
        x = _apply_dense(lp, jax.nn.gelu(x, approximate=False))
    return x


def _pool2x2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, N, D] with N a square grid -> 2x2 average pool -> [B, N/4, D]."""
    b, n, d = x.shape
    g = int(math.isqrt(n))
    assert g * g == n, f"pool projector needs a square token grid, got {n}"
    xg = x.reshape(b, g // 2, 2, g // 2, 2, d)
    return xg.mean(axis=(2, 4)).reshape(b, (g // 2) ** 2, d)


def build_projector(spec: str, vision_dim: int, llm_dim: int) -> Projector:
    """Parse a projector spec string and return (init, apply)."""
    if spec == "identity":
        return Projector(spec, lambda key, dtype=jnp.float32: {},
                         lambda p, x: x, lambda n: n)

    if spec == "linear":
        return Projector(
            spec,
            lambda key, dtype=jnp.float32: _dense(key, vision_dim, llm_dim, dtype),
            _apply_dense,
            lambda n: n)

    m = re.match(r"^mlp(\d+)x_gelu$", spec)
    if m:
        depth = int(m.group(1))
        return Projector(
            spec,
            lambda key, dtype=jnp.float32: _mlp_init(key, vision_dim, llm_dim,
                                                     depth, dtype),
            _mlp_apply,
            lambda n: n)

    m = re.match(r"^pool_mlp(\d+)x_gelu$", spec)
    if m:
        depth = int(m.group(1))
        return Projector(
            spec,
            lambda key, dtype=jnp.float32: _mlp_init(key, vision_dim, llm_dim,
                                                     depth, dtype),
            lambda p, x: _mlp_apply(p, _pool2x2(x)),
            lambda n: n // 4)

    m = re.match(r"^(cheap_)?qformer(\d+)_(\d+)$", spec)
    if m:
        from llavamod_tpu.models.qformer import build_qformer_projector

        cheap = m.group(1) is not None
        layers, queries = int(m.group(2)), int(m.group(3))
        return build_qformer_projector(spec, vision_dim, llm_dim, layers,
                                       queries, cheap=cheap)

    m = re.match(r"^(cheap_)?simple_in(\d+)_out(\d+)$", spec)
    if m:
        from llavamod_tpu.models.qformer import build_simple_projector

        cheap = m.group(1) is not None
        n_in, n_out = int(m.group(2)), int(m.group(3))
        return build_simple_projector(spec, vision_dim, llm_dim, n_in, n_out,
                                      cheap=cheap)

    raise ValueError(f"Unknown projector type: {spec}")
