"""Video projector: per-frame tower features -> LLM embedding tokens.

TPU-native redesign of the reference's optional video projector bundle
(multimodal_projector/builder.py:69-151 `build_video_projector` +
`build_projector.forward_video` :152-198): the reference splits each frame's
tower output into a global (CLS) vector and patch vectors, runs the patch
vectors through any registry projector, optionally adds three 2-layer-GELU
MLP summaries (temporal = per-frame patch mean, global = CLS, spatial =
across-frame patch mean appended after the last frame), then assembles the
per-frame token blocks with nested Python loops over (batch, frames) into
ragged lists.

Here the assembly is a single static-shape concatenation — every sample in
a batch carries the same frame count, so the output is one dense
[B, tokens, D] array (XLA-friendly; no ragged lists, no host loops).  Token
order matches the reference exactly:

    frame j (j < T-1):  [global?] [patch tokens (new_n)] [temporal?]
    frame T-1:          [global?] [patch tokens (new_n)] [temporal?] [spatial? (n)]

(builder.py:160-171: temporal is concatenated AFTER the patch tokens,
global is prepended, spatial is appended to the LAST frame only,
:176-187.)

Note the reference's video TOWERS are stubbed out upstream
(multimodal_encoder/builder.py:39-44 returns None), so this projector is
the complete live video path; `<video>` text placeholders are expanded by
data/preprocess.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from llavamod_tpu.models.projector import (_mlp_apply, _mlp_init,
                                           build_projector)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VideoProjectorConfig:
    """Mirrors the reference's video model args (config/args.py:27-30)."""
    projector_type: str = "linear"   # any registry spec (builder.py:69-110)
    global_proj: bool = False        # CLS summary token per frame
    temporal_proj: bool = False      # patch-mean summary token per frame
    spatial_proj: bool = False       # across-frame patch mean, last frame


class VideoProjector(NamedTuple):
    cfg: VideoProjectorConfig
    init: Callable                    # (key, dtype) -> params
    apply: Callable                   # (params, feats [B,T,1+N,C]) -> [B,S,D]
    num_output_tokens: Callable[[int, int], int]  # (frames, patches) -> S


def build_video_projector(cfg: VideoProjectorConfig, vision_dim: int,
                          llm_dim: int) -> VideoProjector:
    patch = build_projector(cfg.projector_type, vision_dim, llm_dim)

    def init(key, dtype=jnp.float32) -> Params:
        ks = jax.random.split(key, 4)
        params: Params = {"patch": patch.init(ks[0], dtype=dtype)}
        # the three summaries are fixed Linear-GELU-Linear MLPs
        # (builder.py:113-124 `MLP`), independent of the patch spec
        if cfg.global_proj:
            params["global"] = _mlp_init(ks[1], vision_dim, llm_dim, 2, dtype)
        if cfg.temporal_proj:
            params["temporal"] = _mlp_init(ks[2], vision_dim, llm_dim, 2,
                                           dtype)
        if cfg.spatial_proj:
            params["spatial"] = _mlp_init(ks[3], vision_dim, llm_dim, 2,
                                          dtype)
        return params

    def apply(params: Params, feats: jnp.ndarray) -> jnp.ndarray:
        """feats [B, T, 1+N, C] (CLS + patches per frame) -> [B, S, D]."""
        b, t, n1, _ = feats.shape
        cls, patches = feats[:, :, 0, :], feats[:, :, 1:, :]
        n = n1 - 1

        flat = patches.reshape(b * t, n, patches.shape[-1])
        proj = patch.apply(params["patch"], flat)       # [B*T, new_n, D]
        new_n, d = proj.shape[-2], proj.shape[-1]
        blocks = [proj.reshape(b, t, new_n, d)]
        if cfg.temporal_proj:
            tok = _mlp_apply(params["temporal"], patches.mean(axis=2))
            blocks.append(tok[:, :, None, :])           # [B, T, 1, D]
        if cfg.global_proj:
            tok = _mlp_apply(params["global"], cls)
            blocks.insert(0, tok[:, :, None, :])
        frames = jnp.concatenate(blocks, axis=2) if len(blocks) > 1 else blocks[0]
        out = frames.reshape(b, t * frames.shape[2], d)
        if cfg.spatial_proj:
            tail = _mlp_apply(params["spatial"], patches.mean(axis=1))
            out = jnp.concatenate([out, tail], axis=1)  # [B, S + n, D]
        return out

    def num_output_tokens(frames: int, patches: int) -> int:
        per_frame = (patch.num_output_tokens(patches)
                     + int(cfg.global_proj) + int(cfg.temporal_proj))
        return frames * per_frame + (patches if cfg.spatial_proj else 0)

    return VideoProjector(cfg, init, apply, num_output_tokens)
