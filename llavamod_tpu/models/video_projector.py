"""Video projector: per-frame tower features -> LLM embedding tokens.

TPU-native equivalent of the reference's optional video path
(multimodal_projector/builder.py:69-151 `build_video_projector` +
`build_projector.forward_video`, builder.py:151-198):

  * input [B, T, 1+N, C]: per-frame tower features, position 0 = the global
    (CLS) feature, 1..N = the patch grid — the layout every CLIP-style
    frame encoder produces;
  * a per-frame PATCH projector (any spec from models/projector.py — the
    reference reuses the image-projector grammar, builder.py:69-90);
  * three optional 2-layer GELU MLPs (reference `MLP`, builder.py:112-123):
      - temporal: frame-mean over patches -> one token appended per frame
      - global:   the CLS feature       -> one token prepended per frame
      - spatial:  time-mean over frames  -> N tokens appended ONCE at the
                  end of the clip (reference appends to the last frame)

The reference emits a ragged python list of per-frame tensors
(builder.py:176-187); here the output is ONE static [B, T*(g+M+1?) + S, D]
token tensor (g = 1 if global proj, M = patch tokens after projection,
+1 if temporal, S = N if spatial) — ragged lists don't exist under jit, and
the reference's consumer concatenates them anyway.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from llavamod_tpu.models.projector import build_projector

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VideoProjectorConfig:
    video_projector_type: str = "linear"   # any models/projector.py spec
    vision_dim: int = 1024                 # C of the frame tower
    llm_dim: int = 2048
    # reference config flags video_spatial_proj / video_temproal_proj /
    # video_global_proj (sic — the reference misspells 'temporal')
    spatial_proj: bool = False
    temporal_proj: bool = False
    global_proj: bool = False

    def tokens_per_clip(self, num_frames: int, patch_tokens: int) -> int:
        patch = build_projector(self.video_projector_type, self.vision_dim,
                                self.llm_dim).num_output_tokens(patch_tokens)
        per_frame = patch + (1 if self.temporal_proj else 0) \
            + (1 if self.global_proj else 0)
        return num_frames * per_frame + (patch_tokens if self.spatial_proj
                                         else 0)


def _mlp2_init(key, din, dout, dtype):
    """The reference's fixed 2-layer MLP (builder.py:112-123)."""
    k1, k2 = jax.random.split(key)
    def dense(k, i, o):
        w = jax.random.normal(k, (i, o), jnp.float32) * (i ** -0.5)
        return {"kernel": w.astype(dtype), "bias": jnp.zeros((o,), dtype)}
    return {"fc1": dense(k1, din, dout), "fc2": dense(k2, dout, dout)}


def _mlp2_apply(p, x):
    h = x @ p["fc1"]["kernel"] + p["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]


def init(cfg: VideoProjectorConfig, key, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    patch = build_projector(cfg.video_projector_type, cfg.vision_dim,
                            cfg.llm_dim)
    params: Params = {"patch": patch.init(ks[0], dtype=dtype)}
    if cfg.spatial_proj:
        params["spatial"] = _mlp2_init(ks[1], cfg.vision_dim, cfg.llm_dim,
                                       dtype)
    if cfg.temporal_proj:
        params["temporal"] = _mlp2_init(ks[2], cfg.vision_dim, cfg.llm_dim,
                                        dtype)
    if cfg.global_proj:
        params["global"] = _mlp2_init(ks[3], cfg.vision_dim, cfg.llm_dim,
                                      dtype)
    return params


def forward_video(params: Params, cfg: VideoProjectorConfig,
                  feats: jnp.ndarray) -> jnp.ndarray:
    """feats [B, T, 1+N, C] -> tokens [B, tokens_per_clip, D].

    Per-frame layout mirrors the reference (builder.py:151-187):
    [global?][projected patches][temporal?] per frame, frames concatenated
    in time order, then [spatial (time-mean) patches] appended once.
    """
    b, t, n1, c = feats.shape
    global_feat = feats[:, :, 0, :]       # [B, T, C]
    patch_feat = feats[:, :, 1:, :]       # [B, T, N, C]
    n = n1 - 1

    patch = build_projector(cfg.video_projector_type, cfg.vision_dim,
                            cfg.llm_dim)
    proj = patch.apply(params["patch"],
                       patch_feat.reshape(b * t, n, c))  # [BT, M, D]
    m = proj.shape[1]
    proj = proj.reshape(b, t, m, -1)

    per_frame = [proj]
    if cfg.temporal_proj:
        # frame-mean over patches -> one appended token per frame
        tok = _mlp2_apply(params["temporal"], patch_feat.mean(axis=2))
        per_frame.append(tok[:, :, None, :])
    if cfg.global_proj:
        # CLS -> one prepended token per frame
        tok = _mlp2_apply(params["global"], global_feat)
        per_frame.insert(0, tok[:, :, None, :])
    frames = jnp.concatenate(per_frame, axis=2)        # [B, T, g+M+1?, D]
    out = frames.reshape(b, t * frames.shape[2], frames.shape[3])

    if cfg.spatial_proj:
        # time-mean over frames -> N tokens appended once per clip
        tail = _mlp2_apply(params["spatial"], patch_feat.mean(axis=1))
        out = jnp.concatenate([out, tail], axis=1)
    return out
