"""Logit parity for the remaining LLM families + SigLIP.

Closes the interop gap from round-1 review: gemma2, phi, stablelm, MPT
(transformers modelings as oracles), qwen-1.0 and MiniCPM (independent torch
oracles in tests/golden/hf_family_refs.py — transformers ships no modeling
for either), and the SigLIP vision tower.  Each family gets weight import,
logit parity, and a round-trip export check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llavamod_tpu.interop.hf import (
    SUPPORTED_MODEL_TYPES,
    decoder_config_from_hf,
    decoder_params_from_hf,
    decoder_params_to_hf,
    vision_params_from_hf,
)
from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.vision import vit
from llavamod_tpu.models.vision.vit import VisionConfig

import functools

from golden.hf_family_refs import TinyMiniCPM, TinyQwenV1

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file


@functools.partial(jax.jit, static_argnums=1)
def _jit_logits(params, cfg, ids):
    out = decoder.forward(params, cfg, input_ids=ids, attn_impl="xla")
    return decoder.logits_from_hidden(params, cfg, out.hidden)


def _check_parity(hf_model, hf_cfg, ids, rtol=2e-3, atol=2e-3):
    cfg = decoder_config_from_hf(hf_cfg)
    params = decoder_params_from_hf(
        {k: v for k, v in hf_model.state_dict().items()}, cfg)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.float().numpy()
    logits = np.asarray(_jit_logits(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(logits, hf_logits, rtol=rtol, atol=atol)
    return cfg, params


def _check_roundtrip(params, cfg, orig_state):
    exported = decoder_params_to_hf(params, cfg)
    orig = {k: np.asarray(v.float().numpy() if hasattr(v, "float") else v)
            for k, v in orig_state.items()}
    assert exported, "export produced no keys"
    for k, v in exported.items():
        np.testing.assert_allclose(v, orig[k], rtol=1e-6, err_msg=k)


# ---------------------------------------------------------------------------
# gemma2: sublayer norms, softcaps, sliding/global interleave, tied embeds
# ---------------------------------------------------------------------------

def test_gemma2_logit_parity_and_roundtrip():
    hf_cfg = transformers.Gemma2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=8, tie_word_embeddings=True,
        attn_implementation="eager")
    torch.manual_seed(3)
    hf_model = transformers.Gemma2ForCausalLM(hf_cfg).eval()

    cfg = decoder_config_from_hf(hf_cfg)
    assert cfg.post_attn_norm and cfg.post_mlp_norm
    assert cfg.attn_logit_softcap == 50.0 and cfg.head_dim == 16
    # T=16 > window=8 so the even-layer sliding mask is actually exercised
    ids = np.random.RandomState(3).randint(0, 96, size=(2, 16))
    cfg2, params = _check_parity(hf_model, hf_cfg, ids)
    _check_roundtrip(params, cfg2, hf_model.state_dict())


# ---------------------------------------------------------------------------
# phi: parallel block, dense/fc1/fc2 names, partial rotary, lm_head bias
# ---------------------------------------------------------------------------

def test_phi_logit_parity_and_roundtrip():
    hf_cfg = transformers.PhiConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, partial_rotary_factor=0.5,
        layer_norm_eps=1e-5, qk_layernorm=False, hidden_act="gelu_new",
        attn_implementation="eager")
    torch.manual_seed(4)
    hf_model = transformers.PhiForCausalLM(hf_cfg).eval()

    cfg = decoder_config_from_hf(hf_cfg)
    assert cfg.parallel_block and cfg.lm_head_bias
    assert cfg.rotary_dim == 4  # head_dim 8 * 0.5
    ids = np.random.RandomState(4).randint(0, 96, size=(2, 12))
    cfg2, params = _check_parity(hf_model, hf_cfg, ids)
    assert "bias" in params["lm_head"]
    _check_roundtrip(params, cfg2, hf_model.state_dict())


# ---------------------------------------------------------------------------
# stablelm: LayerNorm with biases, partial rotary 0.25
# ---------------------------------------------------------------------------

def test_stablelm_logit_parity_and_roundtrip():
    hf_cfg = transformers.StableLmConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, partial_rotary_factor=0.25,
        layer_norm_eps=1e-5, use_qkv_bias=False, use_parallel_residual=False,
        qk_layernorm=False, attn_implementation="eager")
    torch.manual_seed(5)
    hf_model = transformers.StableLmForCausalLM(hf_cfg).eval()

    cfg = decoder_config_from_hf(hf_cfg)
    assert cfg.norm == "layernorm" and cfg.partial_rotary_factor == 0.25
    ids = np.random.RandomState(5).randint(0, 96, size=(2, 12))
    cfg2, params = _check_parity(hf_model, hf_cfg, ids)
    assert "bias" in params["layers"][0]["input_norm"]  # LN biases imported
    _check_roundtrip(params, cfg2, hf_model.state_dict())


# ---------------------------------------------------------------------------
# MPT: fused Wqkv, ALiBi, no positional embeddings, tied wte head
# ---------------------------------------------------------------------------

def test_mpt_logit_parity_and_roundtrip():
    hf_cfg = transformers.MptConfig(
        d_model=32, n_heads=4, n_layers=2, expansion_ratio=2,
        max_seq_len=64, vocab_size=96,
        attn_config=transformers.models.mpt.configuration_mpt
        .MptAttentionConfig(alibi=True, alibi_bias_max=8),
        attn_implementation="eager")
    torch.manual_seed(6)
    hf_model = transformers.MptForCausalLM(hf_cfg).eval()

    cfg = decoder_config_from_hf(hf_cfg)
    assert cfg.alibi and not cfg.use_rope and cfg.tie_word_embeddings
    ids = np.random.RandomState(6).randint(0, 96, size=(2, 12))
    cfg2, params = _check_parity(hf_model, hf_cfg, ids)
    _check_roundtrip(params, cfg2, hf_model.state_dict())


# ---------------------------------------------------------------------------
# qwen-1.0: fused c_attn split, w1/w2 MLP halves (independent torch oracle)
# ---------------------------------------------------------------------------

def test_qwen_v1_logit_parity_and_roundtrip():
    ocfg = dict(vocab_size=96, hidden_size=32, intermediate_size=48,
                num_layers=2, num_heads=4, rope_theta=10000.0,
                rms_norm_eps=1e-6)
    torch.manual_seed(7)
    oracle = TinyQwenV1(ocfg).eval()

    class _HFQwenCfg:  # minimal qwen-1.0 config.json surface
        model_type = "qwen"
        vocab_size = 96
        hidden_size = 32
        intermediate_size = 96   # HF qwen configs store 2x the half-width
        num_hidden_layers = 2
        num_attention_heads = 4
        seq_length = 64
        rotary_emb_base = 10000.0
        layer_norm_epsilon = 1e-6
        use_dynamic_ntk = True
        use_logn_attn = True
        no_bias = True

    cfg = decoder_config_from_hf(_HFQwenCfg())
    assert cfg.intermediate_size == 48 and cfg.qkv_bias
    assert cfg.use_dynamic_ntk and cfg.use_logn_attn
    params = decoder_params_from_hf(oracle.state_dict(), cfg)

    ids = np.random.RandomState(7).randint(0, 96, size=(2, 12))
    with torch.no_grad():
        want = oracle(torch.tensor(ids)).float().numpy()
    # T=12 << rope_seq_length=64 so NTK/logn scalings are identity here
    got = np.asarray(_jit_logits(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    _check_roundtrip(params, cfg, oracle.state_dict())


# ---------------------------------------------------------------------------
# MiniCPM: mup scalings (independent torch oracle)
# ---------------------------------------------------------------------------

def test_minicpm_logit_parity():
    ocfg = dict(vocab_size=96, hidden_size=32, intermediate_size=64,
                num_layers=4, num_heads=4, rope_theta=10000.0,
                rms_norm_eps=1e-5, scale_emb=12.0, scale_depth=1.4,
                dim_model_base=8)
    torch.manual_seed(8)
    oracle = TinyMiniCPM(ocfg).eval()

    class _HFMiniCPMCfg:
        model_type = "minicpm"
        vocab_size = 96
        hidden_size = 32
        intermediate_size = 64
        num_hidden_layers = 4
        num_attention_heads = 4
        num_key_value_heads = 4
        max_position_embeddings = 64
        rope_theta = 10000.0
        rms_norm_eps = 1e-5
        tie_word_embeddings = True
        scale_emb = 12.0
        scale_depth = 1.4
        dim_model_base = 8

    cfg = decoder_config_from_hf(_HFMiniCPMCfg())
    assert cfg.embed_scale == 12.0
    np.testing.assert_allclose(cfg.residual_scale, 1.4 / 2.0)  # sqrt(4)=2
    np.testing.assert_allclose(cfg.logit_scale, 8.0 / 32.0)
    params = decoder_params_from_hf(oracle.state_dict(), cfg)

    ids = np.random.RandomState(8).randint(0, 96, size=(2, 12))
    with torch.no_grad():
        want = oracle(torch.tensor(ids)).float().numpy()
    got = np.asarray(_jit_logits(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_minicpm_scalings_change_logits():
    """The mup knobs must actually be wired in (not silently ignored)."""
    from llavamod_tpu.models.llm.config import tiny_config

    base = tiny_config(tie_word_embeddings=True)
    scaled = base.replace(embed_scale=12.0, residual_scale=0.7,
                          logit_scale=0.25)
    params = decoder.init(base, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(9).randint(0, 512, size=(1, 8)))
    a = np.asarray(_jit_logits(params, base, ids))
    b = np.asarray(_jit_logits(params, scaled, ids))
    assert np.abs(a - b).max() > 1e-3


# ---------------------------------------------------------------------------
# unsupported layouts fail loudly
# ---------------------------------------------------------------------------

def test_unsupported_model_type_raises():
    class _Cfg:
        model_type = "gptj"
        vocab_size = 96
        hidden_size = 32
        intermediate_size = 64
        num_hidden_layers = 2
        num_attention_heads = 4
        max_position_embeddings = 64

    with pytest.raises(ValueError, match="gptj"):
        decoder_config_from_hf(_Cfg())


def test_unknown_state_dict_layout_raises():
    from llavamod_tpu.models.llm.config import tiny_config

    cfg = tiny_config()
    with pytest.raises(ValueError, match="Unrecognized"):
        decoder_params_from_hf(
            {"h.0.attn.qkv.weight": np.zeros((3, 3))}, cfg)


def test_supported_model_types_list_is_exported():
    assert "gemma2" in SUPPORTED_MODEL_TYPES
    assert "mpt" in SUPPORTED_MODEL_TYPES


# ---------------------------------------------------------------------------
# SigLIP vision tower (no CLS token, no pre-LN, patch bias)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 3))
def _jit_vit(params, cfg, px, select_layer):
    return vit.forward(params, cfg, px, select_layer=select_layer)


def test_siglip_vision_parity():
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
        attn_implementation="eager")
    torch.manual_seed(10)
    hf_model = transformers.SiglipVisionModel(hf_cfg).eval()

    cfg = VisionConfig(name="tiny-siglip", image_size=28, patch_size=14,
                       hidden_size=32, intermediate_size=64, num_layers=3,
                       num_heads=4, use_class_token=False,
                       use_pre_layernorm=False, activation="gelu_tanh",
                       layer_norm_eps=1e-6, patch_bias=True)
    params = vision_params_from_hf(hf_model.state_dict(), cfg)

    px = np.random.RandomState(10).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        hf_out = hf_model(torch.tensor(px), output_hidden_states=True)
    hf_hidden = hf_out.hidden_states[-2].float().numpy()

    ours = np.asarray(_jit_vit(params, cfg, jnp.asarray(px), -2))
    np.testing.assert_allclose(ours, hf_hidden, rtol=2e-3, atol=2e-3)
