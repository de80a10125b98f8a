"""Normalization ops.

fp32 accumulation with cast-back to the input dtype, matching the numerics of
the HF modelings the reference vendors (e.g. Qwen2RMSNorm in
reference qwen1_5/modeling_qwen2.py) so weight-converted checkpoints reproduce
logits.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6,
             offset: float = 0.0) -> jnp.ndarray:
    """RMSNorm: x * w / rms(x).  `offset=1.0` gives the Gemma (1+w) variant."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * (1.0 / jnp.sqrt(var + eps))
    out = normed * (offset + weight.astype(jnp.float32))
    return out.astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) / jnp.sqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
