"""LLaVA glue: vision tower + projector + decoder LLM in one param tree.

TPU-native redesign of the reference's `prepare_inputs_labels_for_multimodal`
(model/llava_arch.py:155-334).  The reference splices 576 image-feature
tokens into each sequence with per-sample ragged concatenation — impossible
under XLA's static shapes.  Here the *data pipeline* pre-expands every
'<image>' placeholder into `num_image_tokens` reserved slots
(data/splice.py), and the model performs a fully-vectorized static gather:

    emb = where(image_mask, image_features[image_pos], token_embeddings)

so the multimodal splice costs one gather + one select on device, fuses into
the embedding lookup, and is identical across batch entries.

Param tree: {'vision': ..., 'projector': ..., 'llm': ...}.  The vision tower
is frozen by stop_gradient (reference clip_encoder.py:31 freezes it with
requires_grad_(False)).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.llm.config import DecoderConfig
from llavamod_tpu.models.projector import Projector, build_projector
from llavamod_tpu.models.vision import vit
from llavamod_tpu.models.vision.vit import VisionConfig

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    llm: DecoderConfig
    vision: VisionConfig
    projector_type: str = "mlp2x_gelu"   # of record: pretrain.sh:31
    select_layer: int = -2               # of record: pretrain.sh:33
    select_feature: str = "patch"
    image_aspect_ratio: str = "pad"
    max_images: int = 1                  # static per-sample image budget
    freeze_vision: bool = True
    s2_scales: Tuple[int, ...] = ()      # e.g. (336, 672) enables S2
    # --- optional video projector bundle (reference multimodal_projector/
    # builder.py:125-205: build_projector pairs the image projector with an
    # optional video projector + forward_image/forward_video).  None = off.
    video_projector_type: Optional[str] = None
    video_global_proj: bool = False
    video_temporal_proj: bool = False
    video_spatial_proj: bool = False
    num_video_frames: int = 8            # static per-video frame budget

    @property
    def vision_feature_dim(self) -> int:
        mult = max(1, len(self.s2_scales))
        return self.vision.hidden_size * mult

    def build_projector(self) -> Projector:
        return build_projector(self.projector_type, self.vision_feature_dim,
                               self.llm.hidden_size)

    @property
    def num_image_tokens(self) -> int:
        return self.build_projector().num_output_tokens(self.vision.num_patches)

    def build_video_projector(self):
        assert self.video_projector_type is not None
        from llavamod_tpu.models.video import (VideoProjectorConfig,
                                               build_video_projector)

        return build_video_projector(
            VideoProjectorConfig(projector_type=self.video_projector_type,
                                 global_proj=self.video_global_proj,
                                 temporal_proj=self.video_temporal_proj,
                                 spatial_proj=self.video_spatial_proj),
            self.vision_feature_dim, self.llm.hidden_size)

    @property
    def num_video_tokens(self) -> int:
        """Video-projector output tokens per video (0 when the path is off)."""
        if self.video_projector_type is None:
            return 0
        return self.build_video_projector().num_output_tokens(
            self.num_video_frames, self.vision.num_patches)

    def replace(self, **kw) -> "LlavaConfig":
        return dataclasses.replace(self, **kw)


class MultimodalBatch(NamedTuple):
    """Static-shape device batch (built on host by data/splice.py)."""
    input_ids: jnp.ndarray    # [B, T] int32; image slots hold 0
    segment_ids: jnp.ndarray  # [B, T] int32; 0 = padding
    image_mask: jnp.ndarray   # [B, T] bool; True at image-feature slots
    image_pos: jnp.ndarray    # [B, T] int32 index into flattened image rows
    pixels: jnp.ndarray       # [B, M, 3, S, S]
    pixel_valid: jnp.ndarray  # [B, M] bool
    labels: Optional[jnp.ndarray] = None  # [B, T] int32 (-100 = ignored)
    positions: Optional[jnp.ndarray] = None
    # video-projector mode only (LlavaConfig.video_projector_type set):
    video_pixels: Optional[jnp.ndarray] = None  # [B, F, 3, S, S]
    video_valid: Optional[jnp.ndarray] = None   # [B] bool


def init(cfg: LlavaConfig, key, dtype=jnp.float32,
         llm_params: Optional[Params] = None,
         vision_params: Optional[Params] = None) -> Params:
    k_v, k_p, k_l, k_vp = jax.random.split(key, 4)
    params = {
        "vision": vision_params if vision_params is not None
        else vit.init(cfg.vision, k_v, dtype),
        "projector": cfg.build_projector().init(k_p, dtype=dtype),
        "llm": llm_params if llm_params is not None
        else decoder.init(cfg.llm, k_l, dtype),
    }
    if cfg.video_projector_type is not None:
        params["video_projector"] = cfg.build_video_projector().init(
            k_vp, dtype=dtype)
    return params


def encode_tower(params: Params, cfg: LlavaConfig,
                 pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [N, 3, S, S] -> frozen tower features [N, patches, D_vis]
    (pre-projector).

    Split out of encode_images so the distillation steps can run the frozen
    CLIP tower ONCE and feed both teacher and student (whose projectors
    differ but whose tower is the same frozen checkpoint — the reference
    instead runs the tower twice per step, align_trainer.py:556-562)."""
    if cfg.s2_scales:
        from llavamod_tpu.models.vision.s2 import multiscale_forward

        feats = multiscale_forward(params["vision"], cfg.vision, pixels,
                                   cfg.s2_scales, cfg.select_layer,
                                   cfg.select_feature)
    else:
        hidden = vit.forward(params["vision"], cfg.vision, pixels,
                             cfg.select_layer)
        feats = vit.select_features(cfg.vision, hidden, cfg.select_feature)
    if cfg.freeze_vision:
        feats = jax.lax.stop_gradient(feats)
    return feats


def encode_images(params: Params, cfg: LlavaConfig, pixels: jnp.ndarray,
                  tower_feats: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """pixels [N, 3, S, S] -> projected features [N, tokens, D_llm].

    Mirrors reference encode_images (llava_arch.py:143-148): frozen tower
    hidden layer `select_layer`, CLS dropped, then the projector.
    """
    if tower_feats is None:
        tower_feats = encode_tower(params, cfg, pixels)
    return cfg.build_projector().apply(params["projector"], tower_feats)


def multimodal_embed(params: Params, cfg: LlavaConfig,
                     batch: MultimodalBatch,
                     tower_feats: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Token embeddings with image features scattered into reserved slots.

    tower_feats: optional precomputed [B*M, patches, D_vis] tower output;
    when given, params['vision'] is never touched (the tree may omit it).
    batch.image_pos may index fewer pixel rows than B*M (e.g. the DPO
    chosen/rejected halves sharing one image set)."""
    b, t = batch.input_ids.shape
    emb = decoder.embed(params["llm"], cfg.llm, batch.input_ids)

    # pixels may cover fewer rows than the token batch (shared image sets)
    pixels = batch.pixels.reshape((-1,) + batch.pixels.shape[2:])
    feats = encode_images(params, cfg, pixels, tower_feats)  # [B*M, N, D]
    valid = batch.pixel_valid.reshape(-1, 1, 1)
    feats = jnp.where(valid, feats, 0.0)

    if cfg.video_projector_type is not None and batch.video_pixels is not None:
        # per-sample media table = [image rows | video rows] — the layout
        # data/splice.py indexed against
        bi = batch.video_pixels.shape[0]
        feats = feats.reshape(bi, -1, feats.shape[-1])
        vfeats = encode_video(params, cfg, batch.video_pixels,
                              batch.video_valid)
        feats = jnp.concatenate([feats, vfeats.astype(feats.dtype)], axis=1)
    flat = feats.reshape(-1, feats.shape[-1])

    gathered = jnp.take(flat, batch.image_pos.reshape(-1), axis=0)
    gathered = gathered.reshape(b, t, -1).astype(emb.dtype)
    return jnp.where(batch.image_mask[..., None], gathered, emb)


def encode_video(params: Params, cfg: LlavaConfig, video_pixels: jnp.ndarray,
                 video_valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """[B, F, 3, S, S] frames -> [B, num_video_tokens, D] via the frozen
    tower (per frame, CLS kept) and the video projector
    (reference builder.py:151-198 forward_video semantics; models/video.py).
    """
    b, f = video_pixels.shape[:2]
    px = video_pixels.reshape((-1,) + video_pixels.shape[2:])
    hidden = vit.forward(params["vision"], cfg.vision, px, cfg.select_layer)
    feats = vit.select_features(cfg.vision, hidden, "cls_patch")
    if cfg.freeze_vision:
        feats = jax.lax.stop_gradient(feats)
    if not cfg.vision.use_class_token:
        # the video projector splits [CLS | patches]; towers without a class
        # token get a zero CLS row (global_proj off for such towers)
        zeros = jnp.zeros_like(feats[:, :1])
        feats = jnp.concatenate([zeros, feats], axis=1)
    feats = feats.reshape(b, f, feats.shape[-2], feats.shape[-1])
    out = cfg.build_video_projector().apply(params["video_projector"], feats)
    if video_valid is not None:
        out = jnp.where(video_valid.reshape(-1, 1, 1), out, 0.0)
    return out


class LlavaOutput(NamedTuple):
    hidden: jnp.ndarray
    aux_loss: jnp.ndarray
    moe_losses: Tuple[jnp.ndarray, ...]
    router_probs: Tuple[jnp.ndarray, ...]
    cache: Optional[decoder.KVCache]


def forward(params: Params, cfg: LlavaConfig, batch: MultimodalBatch,
            *, cache: Optional[decoder.KVCache] = None, train: bool = False,
            attn_impl: str = "auto", remat: bool = False,
            tower_feats: Optional[jnp.ndarray] = None,
            prefix_mask: Optional[jnp.ndarray] = None) -> LlavaOutput:
    emb = multimodal_embed(params, cfg, batch, tower_feats)
    out = decoder.forward(
        params["llm"], cfg.llm, inputs_embeds=emb,
        positions=batch.positions, segment_ids=batch.segment_ids,
        cache=cache, train=train, attn_impl=attn_impl, remat=remat,
        prefix_mask=prefix_mask)
    return LlavaOutput(out.hidden, out.aux_loss, out.moe_losses,
                       out.router_probs, out.cache)


def initialize_vision_tokenizer(params: Params, cfg: LlavaConfig, tokenizer,
                                *, mm_use_im_patch_token: bool = False,
                                mm_use_im_start_end: bool = False,
                                pretrain_mm_mlp_adapter: Optional[str] = None):
    """Add image special tokens and resize the embedding rows.

    Functional port of reference initialize_vision_tokenizer
    (model/llava_arch.py:336-379): new tokens are registered on the
    tokenizer, the embedding (and untied lm_head) gains rows initialized to
    the mean of the existing rows, and a stage-1 mm_projector.bin may donate
    the trained embed rows.  Returns (params, cfg) with the grown vocab.
    """
    from llavamod_tpu.constants import (
        DEFAULT_IM_END_TOKEN,
        DEFAULT_IM_START_TOKEN,
        DEFAULT_IMAGE_PATCH_TOKEN,
    )

    new_tokens = []
    if mm_use_im_patch_token:
        new_tokens.append(DEFAULT_IMAGE_PATCH_TOKEN)
    if mm_use_im_start_end:
        new_tokens += [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN]
    if not new_tokens:
        return params, cfg
    num_new = tokenizer.add_tokens(new_tokens, special_tokens=True)
    if num_new <= 0:
        return params, cfg

    def grow(w):
        mean = jnp.mean(w, axis=0, keepdims=True)
        return jnp.concatenate(
            [w, jnp.broadcast_to(mean, (num_new, w.shape[1])).astype(w.dtype)],
            axis=0)

    params = dict(params)
    llm = dict(params["llm"])
    embed = dict(llm["embed"])
    embed["embedding"] = grow(embed["embedding"])
    llm["embed"] = embed
    if "lm_head" in llm:
        head = dict(llm["lm_head"])
        head["weight"] = grow(head["weight"])
        llm["lm_head"] = head
    params["llm"] = llm
    cfg = cfg.replace(llm=cfg.llm.replace(
        vocab_size=cfg.llm.vocab_size + num_new))

    if mm_use_im_start_end and pretrain_mm_mlp_adapter:
        import torch

        state = torch.load(pretrain_mm_mlp_adapter, map_location="cpu",
                           weights_only=True)
        if "model.embed_tokens.weight" in state:
            w = jnp.asarray(np.asarray(state["model.embed_tokens.weight"].float()))
            assert num_new == 2, num_new
            e = params["llm"]["embed"]["embedding"]
            if w.shape == e.shape:
                e = e.at[-num_new:].set(w[-num_new:].astype(e.dtype))
            elif w.shape[0] == num_new:
                e = e.at[-num_new:].set(w.astype(e.dtype))
            else:
                raise ValueError(
                    f"Unexpected embed_tokens_weight shape {w.shape} "
                    f"vs {e.shape} with {num_new} new tokens")
            params["llm"]["embed"]["embedding"] = e
    return params, cfg


def logits(params: Params, cfg: LlavaConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    return decoder.logits_from_hidden(params["llm"], cfg.llm, hidden)


def lm_head_weight(params: Params, cfg: LlavaConfig) -> jnp.ndarray:
    return decoder.lm_head_weight(params["llm"], cfg.llm)
