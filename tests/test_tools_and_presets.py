"""Tests: delta/consolidate tools, initialize_vision_tokenizer, MPT (ALiBi)
and Qwen-1.0 presets (VERDICT round-1 missing #8 and coverage row 22)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llavamod_tpu.models import llava as llava_mod
from llavamod_tpu.models.llava import LlavaConfig, initialize_vision_tokenizer
from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.llm.config import llm_configs, tiny_config
from llavamod_tpu.models.vision.vit import tiny_vision_config
from llavamod_tpu.tools.delta import apply_delta, make_delta

pytestmark = pytest.mark.slow  # compile-heavy numerics; -m "not slow" skips


# ---------------------------------------------------------------------------
# delta
# ---------------------------------------------------------------------------

def _llava(seed=0, vocab=512):
    cfg = LlavaConfig(llm=tiny_config(vocab_size=vocab),
                      vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu")
    return cfg, llava_mod.init(cfg, jax.random.PRNGKey(seed))


def test_delta_roundtrip():
    _, base = _llava(0)
    _, target = _llava(1)
    delta = make_delta(base, target)
    recovered = apply_delta(base, delta)
    for a, b in zip(jax.tree_util.tree_leaves(recovered),
                    jax.tree_util.tree_leaves(target)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_delta_resized_vocab():
    _, base = _llava(0, vocab=512)
    _, target = _llava(1, vocab=514)  # grew 2 special tokens
    delta = make_delta(base, target)
    rec = apply_delta(base, delta)
    np.testing.assert_allclose(
        np.asarray(rec["llm"]["embed"]["embedding"]),
        np.asarray(target["llm"]["embed"]["embedding"]), rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# initialize_vision_tokenizer
# ---------------------------------------------------------------------------

class GrowTok:
    def __init__(self):
        self.extra = []

    def add_tokens(self, toks, special_tokens=True):
        new = [t for t in toks if t not in self.extra]
        self.extra.extend(new)
        return len(new)


def test_initialize_vision_tokenizer_grows_embeddings():
    cfg, params = _llava(0)
    v0 = cfg.llm.vocab_size
    tok = GrowTok()
    params2, cfg2 = initialize_vision_tokenizer(
        params, cfg, tok, mm_use_im_patch_token=True, mm_use_im_start_end=True)
    assert cfg2.llm.vocab_size == v0 + 3
    e = np.asarray(params2["llm"]["embed"]["embedding"])
    assert e.shape[0] == v0 + 3
    # new rows = mean of the old rows
    np.testing.assert_allclose(e[-1], np.asarray(
        params["llm"]["embed"]["embedding"]).mean(0), rtol=1e-5, atol=1e-6)
    # forward still works with the grown vocab
    out = decoder.forward(params2["llm"], cfg2.llm,
                          input_ids=jnp.array([[v0, v0 + 2, 1]]))
    assert np.isfinite(np.asarray(out.hidden)).all()


def test_initialize_vision_tokenizer_noop():
    cfg, params = _llava(0)
    p2, c2 = initialize_vision_tokenizer(params, cfg, GrowTok())
    assert c2.llm.vocab_size == cfg.llm.vocab_size


# ---------------------------------------------------------------------------
# MPT (ALiBi, no rope) and Qwen-1.0 presets
# ---------------------------------------------------------------------------

def test_presets_registered():
    assert llm_configs.get("mpt").alibi and not llm_configs.get("mpt").use_rope
    assert llm_configs.get("qwen-7b").qkv_bias
    assert llm_configs.match_substring("llava-mpt-7b-chat") == "mpt-7b"
    assert llm_configs.match_substring("qwen-7b-base") == "qwen-7b"


def _mpt_tiny():
    return tiny_config(norm="layernorm", activation="gelu", gated_mlp=False,
                       use_rope=False, alibi=True, qkv_bias=False,
                       num_heads=4, num_kv_heads=4)


def test_mpt_style_forward_and_cache_parity():
    cfg = _mpt_tiny()
    params = decoder.init(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    full = decoder.forward(params, cfg, input_ids=ids)
    assert np.isfinite(np.asarray(full.hidden)).all()

    # incremental decode with KV cache must match the full forward
    cache = decoder.init_cache(cfg, 2, 12, dtype=jnp.float32)
    out1 = decoder.forward(params, cfg, input_ids=ids[:, :8], cache=cache)
    out2 = decoder.forward(params, cfg, input_ids=ids[:, 8:],
                           cache=out1.cache)
    np.testing.assert_allclose(np.asarray(out2.hidden),
                               np.asarray(full.hidden[:, 8:]),
                               rtol=2e-4, atol=2e-5)


def test_alibi_bias_prefers_recent_tokens():
    """Two identical keys at different distances: the closer one must get
    the larger attention weight under ALiBi."""
    from llavamod_tpu.models.llm.decoder import _alibi_bias, _alibi_slopes

    cfg = _mpt_tiny()
    pos = jnp.arange(8)[None, :]
    bias = _alibi_bias(cfg, pos, pos)  # [1, H, 8, 8]
    b = np.asarray(bias[0, 0])
    assert b[7, 6] > b[7, 0]  # nearer key penalized less
    assert b[3, 3] == 0.0
    slopes = np.asarray(_alibi_slopes(8))
    assert slopes[0] > slopes[-1] > 0


# ---------------------------------------------------------------------------
# int8 KV cache
# ---------------------------------------------------------------------------

def test_int8_kv_cache_decode_parity():
    """Quantized-cache incremental decode tracks the full fp32 forward
    (the TPU answer to the reference's optional quantized-KV CUDA kernel,
    qwen/cpp_kernels.py:39-55)."""
    cfg = tiny_config(num_heads=4, num_kv_heads=2)
    params = decoder.init(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    full = decoder.forward(params, cfg, input_ids=ids)

    cache = decoder.init_cache(cfg, 2, 12, dtype="int8")
    assert cache.quantized and cache.k.dtype == jnp.int8
    o1 = decoder.forward(params, cfg, input_ids=ids[:, :8], cache=cache)
    o2 = decoder.forward(params, cfg, input_ids=ids[:, 8:], cache=o1.cache)
    assert o2.cache.k.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(o2.hidden),
                               np.asarray(full.hidden[:, 8:]),
                               rtol=0.08, atol=0.05)
    # meaningfully tighter than no cache at all would be: the error is
    # quantization-level, not structural
    err = np.max(np.abs(np.asarray(o2.hidden) - np.asarray(full.hidden[:, 8:])))
    assert err < 0.2, err


def test_int8_generation_runs():
    from llavamod_tpu.generation import GenerationConfig, generate
    from llavamod_tpu.models import llava as llava_mod
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.train.steps import batch_from_arrays

    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu")
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    b, t = 2, 8
    s = cfg.vision.image_size
    batch = batch_from_arrays({
        "input_ids": np.ones((b, t), np.int32),
        "segment_ids": np.ones((b, t), np.int32),
        "image_mask": np.zeros((b, t), bool),
        "image_pos": np.zeros((b, t), np.int32),
        "pixels": np.zeros((b, 1, 3, s, s), np.float32),
        "pixel_valid": np.zeros((b, 1), bool),
        "labels": np.zeros((b, t), np.int32),
    })
    out = generate(params, cfg, batch,
                   GenerationConfig(max_new_tokens=6, cache_dtype="int8"))
    assert out.shape == (2, 6)


# ---------------------------------------------------------------------------
# extract_mm_projector / merge_lora tools
# ---------------------------------------------------------------------------

def test_extract_mm_projector_from_native(tmp_path):
    from llavamod_tpu.models.builder import save_model
    from llavamod_tpu.tools.extract_mm_projector import extract_mm_projector

    cfg, params = _llava(0)
    d = str(tmp_path / "m")
    save_model(d, cfg, jax.tree_util.tree_map(np.asarray, params))
    out = extract_mm_projector(d, str(tmp_path / "mm_projector.bin"))
    import torch

    state = torch.load(out, map_location="cpu", weights_only=True)
    assert any("image_spatial_proj" in k for k in state)


def test_merge_lora_tool_roundtrip(tmp_path):
    from llavamod_tpu.models.builder import load_model, save_model
    from llavamod_tpu.models.lora import LoraConfig, init_lora, merge_lora, save_lora_adapter
    from llavamod_tpu.tools.merge_lora import merge_lora_weights

    cfg, params = _llava(0)
    params = jax.tree_util.tree_map(np.asarray, params)
    base_dir = str(tmp_path / "base")
    save_model(base_dir, cfg, params)

    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(params, lcfg, jax.random.PRNGKey(1))
    lora = jax.tree_util.tree_map(lambda x: x + 0.05, lora)
    adapter_dir = str(tmp_path / "adapter")
    save_lora_adapter(adapter_dir, lora, lcfg)

    out_dir = merge_lora_weights(adapter_dir, base_dir, str(tmp_path / "out"))
    _, merged = load_model(out_dir)
    expected = merge_lora(params, lora, lcfg)
    np.testing.assert_allclose(
        np.asarray(merged["llm"]["layers"][0]["mlp"]["up"]),
        np.asarray(expected["llm"]["layers"][0]["mlp"]["up"]),
        rtol=1e-5, atol=1e-6)


def test_int8_quantized_decoder_close_to_float():
    """quantize_decoder_int8: per-channel weight + dynamic activation int8
    keeps hidden states within quantization-level error of the float path
    (the optional quantized-teacher inference mode)."""
    cfg = tiny_config(num_heads=4, num_kv_heads=4, hidden_size=64,
                      intermediate_size=128, num_layers=2)
    params = decoder.init(cfg, jax.random.PRNGKey(0))
    qparams = dict(params)
    qparams = decoder.quantize_decoder_int8(params)
    assert qparams["layers"][0]["attn"]["wqkv"]["w_int8"].dtype == jnp.int8

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    h_f = decoder.forward(params, cfg, input_ids=ids).hidden
    h_q = decoder.forward(qparams, cfg, input_ids=ids).hidden
    ref = np.asarray(h_f)
    err = np.abs(np.asarray(h_q) - ref).max()
    scale = np.abs(ref).max()
    assert err < 0.05 * scale, (err, scale)
