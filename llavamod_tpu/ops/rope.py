"""Rotary position embeddings.

Half-split ("rotate_half") layout matching HF Llama/Qwen2 so converted
checkpoints reproduce logits.  Supports partial rotary (phi/stablelm) and
scaled theta.  Tables are computed in fp32 and applied in fp32 with cast-back.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rope_table(positions: jnp.ndarray, head_dim: int, theta: float = 10000.0,
               rotary_dim: int | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions.

    positions: [..., T] int32.  Returns (cos, sin) each [..., T, rotary_dim]
    where the rotary_dim axis is the HF duplicated layout
    [f0..f_{r/2-1}, f0..f_{r/2-1}].
    """
    rdim = rotary_dim or head_dim
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rdim, 2, dtype=jnp.float32) / rdim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., T, r/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding to q or k.

    x: [B, T, H, Dh]; cos/sin: [B, T, r] or [T, r] with r <= Dh (partial
    rotary leaves the tail dims untouched).
    """
    rdim = cos.shape[-1]
    dtype = x.dtype
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    xr = x[..., :rdim].astype(jnp.float32)
    rotated = xr * c + _rotate_half(xr) * s
    if rdim == x.shape[-1]:
        return rotated.astype(dtype)
    return jnp.concatenate([rotated.astype(dtype), x[..., rdim:]], axis=-1)
