"""Logit-level parity against HuggingFace reference implementations.

The reference wraps HF modelings; our converted weights must reproduce their
logits (BASELINE.md: "logit-level output parity for the public inference
entry points").  Tiny randomly-initialized HF models on CPU serve as the
oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llavamod_tpu.interop.hf import (
    decoder_config_from_hf,
    decoder_params_from_hf,
    decoder_params_to_hf,
    vision_params_from_hf,
)
from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.vision import vit
from llavamod_tpu.models.vision.vit import VisionConfig

import functools

pytestmark = pytest.mark.slow  # compile-heavy numerics; -m "not slow" skips


@functools.partial(jax.jit, static_argnums=1)
def _jit_logits(params, cfg, ids):
    out = decoder.forward(params, cfg, input_ids=ids, attn_impl="xla")
    return decoder.logits_from_hidden(params, cfg, out.hidden)


@functools.partial(jax.jit, static_argnums=(1, 3))
def _jit_vit(params, cfg, px, select_layer):
    return vit.forward(params, cfg, px, select_layer=select_layer)


def _tiny_hf_qwen2():
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_dropout=0.0)
    torch.manual_seed(0)
    model = transformers.Qwen2ForCausalLM(cfg)
    model.eval()
    return cfg, model


def test_qwen2_logit_parity():
    hf_cfg, hf_model = _tiny_hf_qwen2()
    cfg = decoder_config_from_hf(hf_cfg)
    assert cfg.qkv_bias  # qwen2 uses qkv bias
    params = decoder_params_from_hf(hf_model.state_dict(), cfg)

    ids = np.random.RandomState(0).randint(0, 128, size=(2, 10))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.float().numpy()

    logits = np.asarray(_jit_logits(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-3, atol=2e-3)


def test_qwen2_roundtrip_export():
    hf_cfg, hf_model = _tiny_hf_qwen2()
    cfg = decoder_config_from_hf(hf_cfg)
    params = decoder_params_from_hf(hf_model.state_dict(), cfg)
    exported = decoder_params_to_hf(params, cfg)
    orig = hf_model.state_dict()
    for k, v in exported.items():
        np.testing.assert_allclose(v, orig[k].float().numpy(), rtol=1e-6,
                                   err_msg=k)


def test_llama_logit_parity():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, attention_bias=False)
    torch.manual_seed(1)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = decoder_config_from_hf(hf_cfg)
    assert not cfg.qkv_bias
    params = decoder_params_from_hf(hf_model.state_dict(), cfg)

    ids = np.random.RandomState(1).randint(0, 96, size=(1, 12))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.float().numpy()
    logits = np.asarray(_jit_logits(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-3, atol=2e-3)


def test_clip_vision_parity():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu", layer_norm_eps=1e-5)
    torch.manual_seed(2)
    hf_model = transformers.CLIPVisionModel(hf_cfg).eval()

    cfg = VisionConfig(name="tiny-clip", image_size=28, patch_size=14,
                       hidden_size=32, intermediate_size=64, num_layers=3,
                       num_heads=4, patch_bias=False)
    params = vision_params_from_hf(hf_model.state_dict(), cfg)

    px = np.random.RandomState(2).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        hf_out = hf_model(torch.tensor(px), output_hidden_states=True)
    # select_layer -2 (the LLaVA default)
    hf_hidden = hf_out.hidden_states[-2].float().numpy()

    ours = np.asarray(_jit_vit(params, cfg, jnp.asarray(px), -2))
    np.testing.assert_allclose(ours, hf_hidden, rtol=2e-3, atol=2e-3)


def test_clip_feature_select():
    cfg = VisionConfig(name="tiny-clip", image_size=28, patch_size=14,
                       hidden_size=32, intermediate_size=64, num_layers=2,
                       num_heads=4, patch_bias=False)
    params = vit.init(cfg, jax.random.PRNGKey(0))
    px = jnp.zeros((1, 3, 28, 28))
    hidden = _jit_vit(params, cfg, px, -2)
    assert hidden.shape == (1, 5, 32)  # 4 patches + CLS
    patch = vit.select_features(cfg, hidden, "patch")
    assert patch.shape == (1, 4, 32)
    both = vit.select_features(cfg, hidden, "cls_patch")
    assert both.shape == (1, 5, 32)
