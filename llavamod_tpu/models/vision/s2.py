"""Scaling-on-Scales (S2) multi-scale vision features.

Equivalent of the reference's CLIPVisionTowerS2 (clips2_encoder.py:8-67,
which delegates to the external `s2wrapper` package): for each scale in
`scales`, resize the image, split into base-size tiles, encode every tile
with the shared ViT, reassemble tile feature grids into one large grid,
average-pool back to the base grid, and concatenate channels across scales
=> feature dim = hidden_size * len(scales).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from llavamod_tpu.models.vision import vit
from llavamod_tpu.models.vision.vit import VisionConfig


def _resize(pixels: jnp.ndarray, size: int) -> jnp.ndarray:
    b, c, h, w = pixels.shape
    return jax.image.resize(pixels, (b, c, size, size), method="bicubic")


def multiscale_forward(params, cfg: VisionConfig, pixels: jnp.ndarray,
                       scales: Sequence[int], select_layer: int = -2,
                       select_feature: str = "patch") -> jnp.ndarray:
    """pixels [B, 3, S0, S0] -> [B, num_patches, hidden * len(scales)]."""
    base = cfg.image_size
    g = cfg.grid
    b = pixels.shape[0]
    outs = []
    for scale in scales:
        x = pixels if scale == base else _resize(pixels, scale)
        n_split = scale // base
        if n_split == 1:
            hidden = vit.forward(params, cfg, x, select_layer)
            feats = vit.select_features(cfg, hidden, select_feature)
            outs.append(feats)
            continue
        # split into tiles: [B, 3, n, base, n, base] -> [B*n*n, 3, base, base]
        tiles = x.reshape(b, 3, n_split, base, n_split, base)
        tiles = tiles.transpose(0, 2, 4, 1, 3, 5).reshape(
            b * n_split * n_split, 3, base, base)
        hidden = vit.forward(params, cfg, tiles, select_layer)
        feats = vit.select_features(cfg, hidden, select_feature)  # [B*n*n, g*g, D]
        d = feats.shape[-1]
        # reassemble the full feature grid then average-pool to the base grid
        grid = feats.reshape(b, n_split, n_split, g, g, d)
        grid = grid.transpose(0, 1, 3, 2, 4, 5).reshape(b, n_split * g, n_split * g, d)
        pooled = grid.reshape(b, g, n_split, g, n_split, d).mean(axis=(2, 4))
        outs.append(pooled.reshape(b, g * g, d))
    return jnp.concatenate(outs, axis=-1)
