"""Vision transformer encoder (CLIP-ViT and SigLIP in one implementation).

Functional-JAX equivalent of the reference's frozen HF towers
(multimodal_encoder/clip_encoder.py:7-84, siglip_encoder.py:8-81): patchify
via conv (= unfold + matmul on the MXU), optional class token, learned
position embeddings, pre-LN transformer blocks, feature selection from an
intermediate layer (`select_layer`, default -2) with the CLS token dropped
for `select_feature='patch'`.

Flags cover the CLIP/SigLIP differences: class token, pre-layernorm,
activation (quick_gelu vs gelu_tanh), attention bias.  The tower is always
frozen in this framework (reference clip_encoder.py:31) — callers simply
stop_gradient its output.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from llavamod_tpu.ops.attention import dot_product_attention
from llavamod_tpu.ops.norms import layer_norm
from llavamod_tpu.utils.registry import Registry

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    name: str = "clip-vit-l-336"
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    use_class_token: bool = True      # CLIP yes, SigLIP no
    use_pre_layernorm: bool = True    # CLIP yes, SigLIP no
    activation: str = "quick_gelu"    # quick_gelu | gelu_tanh
    layer_norm_eps: float = 1e-5
    patch_bias: bool = True           # SigLIP has patch-embedding bias; CLIP not

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_class_token else 0)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


vision_configs: Registry[VisionConfig] = Registry("vision config")

CLIP_VIT_L_336 = VisionConfig()
vision_configs.register("clip-vit-l-336", CLIP_VIT_L_336,
                        aliases=("openai/clip-vit-large-patch14-336", "openai", "laion"))

SIGLIP_SO400M_384 = VisionConfig(
    name="siglip-so400m-384", image_size=384, patch_size=14, hidden_size=1152,
    intermediate_size=4304, num_layers=27, num_heads=16,
    use_class_token=False, use_pre_layernorm=False, activation="gelu_tanh",
    layer_norm_eps=1e-6, patch_bias=True)
vision_configs.register("siglip-so400m-384", SIGLIP_SO400M_384,
                        aliases=("google/siglip-so400m-patch14-384", "google"))


def tiny_vision_config(**kw) -> VisionConfig:
    base = dict(name="tiny-vit", image_size=28, patch_size=14, hidden_size=32,
                intermediate_size=64, num_layers=2, num_heads=4)
    base.update(kw)
    return VisionConfig(**base)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _ln_params(d, dtype):
    return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init(cfg: VisionConfig, key, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size
    ks = jax.random.split(key, cfg.num_layers + 4)
    scale = d ** -0.5

    patch_kernel = (jax.random.normal(
        ks[0], (cfg.patch_size * cfg.patch_size * 3, d), jnp.float32) * 0.02)
    params: Params = {
        "patch_embed": {"kernel": patch_kernel.astype(dtype)},
        "pos_embed": (jax.random.normal(ks[1], (cfg.seq_len, d), jnp.float32)
                      * scale).astype(dtype),
        "layers": [],
        "post_ln": _ln_params(d, dtype),
    }
    if cfg.patch_bias:
        params["patch_embed"]["bias"] = jnp.zeros((d,), dtype)
    if cfg.use_class_token:
        params["class_token"] = (jax.random.normal(ks[2], (d,), jnp.float32)
                                 * scale).astype(dtype)
    if cfg.use_pre_layernorm:
        params["pre_ln"] = _ln_params(d, dtype)

    def dense(k, din, dout):
        w = jax.random.normal(k, (din, dout), jnp.float32) * (din ** -0.5)
        return {"kernel": w.astype(dtype), "bias": jnp.zeros((dout,), dtype)}

    for i in range(cfg.num_layers):
        lk = jax.random.split(ks[3 + i], 6)
        params["layers"].append({
            "ln1": _ln_params(d, dtype),
            "attn": {
                "q": dense(lk[0], d, d),
                "k": dense(lk[1], d, d),
                "v": dense(lk[2], d, d),
                "o": dense(lk[3], d, d),
            },
            "ln2": _ln_params(d, dtype),
            "mlp": {
                "fc1": dense(lk[4], d, cfg.intermediate_size),
                "fc2": dense(lk[5], cfg.intermediate_size, d),
            },
        })
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _act(cfg: VisionConfig, x):
    if cfg.activation == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=True)


def patchify(cfg: VisionConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, 3, H, W] -> patches [B, N, P*P*3] (row-major patch grid).

    Equivalent to the conv patch embedding but expressed as reshape + matmul
    so the projection is one big MXU matmul.
    """
    b, c, hh, ww = pixels.shape
    p = cfg.patch_size
    g = hh // p
    x = pixels.reshape(b, c, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, p, p]
    return x.reshape(b, g * g, c * p * p)


def forward(params: Params, cfg: VisionConfig, pixels: jnp.ndarray,
            select_layer: int = -2) -> jnp.ndarray:
    """pixels: [B, 3, S, S] -> hidden states [B, seq, D] of the selected layer.

    select_layer indexes HF-style hidden_states where index 0 is the embedding
    output and index i is the output of block i; -2 = all-but-last block
    (reference shells use -2: shells/train/qwen/pretrain.sh:33).
    """
    b = pixels.shape[0]
    patches = patchify(cfg, pixels.astype(params["patch_embed"]["kernel"].dtype))
    # HF conv kernel layout is [D, C, p, p] -> ours [C*p*p, D] (converted once)
    x = patches @ params["patch_embed"]["kernel"]
    if cfg.patch_bias:
        x = x + params["patch_embed"]["bias"]
    if cfg.use_class_token:
        cls = jnp.broadcast_to(params["class_token"], (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + params["pos_embed"]
    if cfg.use_pre_layernorm:
        x = layer_norm(x, params["pre_ln"]["weight"], params["pre_ln"]["bias"],
                       cfg.layer_norm_eps)

    num_blocks = cfg.num_layers + select_layer + 1 if select_layer < 0 else select_layer
    assert 0 <= num_blocks <= cfg.num_layers

    h = cfg.num_heads
    dh = cfg.head_dim

    def block(x, layer):
        ln1 = layer_norm(x, layer["ln1"]["weight"], layer["ln1"]["bias"],
                         cfg.layer_norm_eps)
        a = layer["attn"]
        q = (ln1 @ a["q"]["kernel"] + a["q"]["bias"]).reshape(b, -1, h, dh)
        k = (ln1 @ a["k"]["kernel"] + a["k"]["bias"]).reshape(b, -1, h, dh)
        v = (ln1 @ a["v"]["kernel"] + a["v"]["bias"]).reshape(b, -1, h, dh)
        # XLA path on purpose: 577 tokens pad to 1024 in the flash kernel
        # and the padding overhead loses (measured on v5e)
        attn = dot_product_attention(q, k, v, causal=False, impl="xla")
        attn = attn.reshape(b, -1, cfg.hidden_size) @ a["o"]["kernel"] + a["o"]["bias"]
        x = x + attn

        ln2 = layer_norm(x, layer["ln2"]["weight"], layer["ln2"]["bias"],
                         cfg.layer_norm_eps)
        m = layer["mlp"]
        hdn = _act(cfg, ln2 @ m["fc1"]["kernel"] + m["fc1"]["bias"])
        return x + (hdn @ m["fc2"]["kernel"] + m["fc2"]["bias"]), None

    # scan over stacked homogeneous blocks: one traced block => fast compiles
    active = params["layers"][:num_blocks]
    if len(active) > 1:
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *active)
        x, _ = jax.lax.scan(block, x, stacked)
    else:
        for layer in active:
            x, _ = block(x, layer)
    return x


def select_features(cfg: VisionConfig, hidden: jnp.ndarray,
                    select_feature: str = "patch") -> jnp.ndarray:
    """Drop/keep the CLS token (reference clip_encoder.py:35-43)."""
    if not cfg.use_class_token:
        return hidden
    if select_feature == "patch":
        return hidden[:, 1:]
    if select_feature == "cls_patch":
        return hidden
    raise ValueError(f"Unexpected select feature: {select_feature}")
