"""Sampling-path tests for generation (_sample semantics + left-pad decode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llavamod_tpu.generation import GenerationConfig, _sample, generate
from llavamod_tpu.models import llava as llava_mod
from llavamod_tpu.models.llava import LlavaConfig
from llavamod_tpu.models.llm.config import tiny_config
from llavamod_tpu.models.vision.vit import tiny_vision_config
from llavamod_tpu.train.steps import batch_from_arrays

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file


def test_greedy_is_argmax():
    logits = jnp.asarray([[0.0, 5.0, 1.0], [2.0, 0.0, -1.0]])
    out = _sample(logits, GenerationConfig(temperature=0.0),
                  jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), [1, 0])


def test_top_k_restricts_support():
    logits = jnp.asarray([[0.0, 10.0, 9.0, -5.0]])
    gcfg = GenerationConfig(temperature=1.0, top_k=2)
    counts = set()
    for i in range(32):
        tok = int(_sample(logits, gcfg, jax.random.PRNGKey(i))[0])
        counts.add(tok)
    assert counts <= {1, 2}
    assert 1 in counts


def test_top_p_keeps_nucleus():
    # one dominant token holds > 0.95 of the mass
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    gcfg = GenerationConfig(temperature=1.0, top_p=0.9)
    for i in range(8):
        assert int(_sample(logits, gcfg, jax.random.PRNGKey(i))[0]) == 0


def test_temperature_spreads_distribution():
    logits = jnp.asarray([[2.0, 1.9, 1.8, 0.0]])
    hot = {int(_sample(logits, GenerationConfig(temperature=5.0),
                       jax.random.PRNGKey(i))[0]) for i in range(64)}
    assert len(hot) >= 3  # high temperature visits several tokens


def _tiny_batch(cfg, left_pad: int):
    b, t = 2, 10
    s = cfg.vision.image_size
    seg = np.ones((b, t), np.int32)
    seg[:, :left_pad] = 0
    ids = np.ones((b, t), np.int32) * 7
    ids[:, :left_pad] = 0
    return batch_from_arrays({
        "input_ids": ids, "segment_ids": seg,
        "image_mask": np.zeros((b, t), bool),
        "image_pos": np.zeros((b, t), np.int32),
        "pixels": np.zeros((b, 1, 3, s, s), np.float32),
        "pixel_valid": np.zeros((b, 1), bool),
        "labels": np.zeros((b, t), np.int32),
    })


def test_left_padding_invariant_greedy_decode():
    """The same prompt with more left padding must decode the same tokens
    (segment-aware positions + masking)."""
    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu")
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    gcfg = GenerationConfig(max_new_tokens=5, pad_token_id=0)
    out_a = generate(params, cfg, _tiny_batch(cfg, left_pad=0), gcfg)
    out_b = generate(params, cfg, _tiny_batch(cfg, left_pad=3), gcfg)
    np.testing.assert_array_equal(out_a, out_b)


def test_stream_matches_generate_greedy():
    """Chunked streaming decode == one-shot generate (same tokens)."""
    from llavamod_tpu.generation import generate_stream, truncate_at_stops

    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu")
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    gcfg = GenerationConfig(max_new_tokens=11, pad_token_id=0,
                            eos_token_ids=(3,))
    batch = _tiny_batch(cfg, left_pad=1)
    want = generate(params, cfg, batch, gcfg)
    chunks = list(generate_stream(params, cfg, batch, gcfg, chunk=4))
    # prefill yield is a single token; chunk sizes are <= 4
    assert chunks[0].shape == (2, 1)
    assert all(c.shape[1] <= 4 for c in chunks)
    got = truncate_at_stops(np.concatenate(chunks, axis=1), gcfg)
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_stream_matches_generate_sampled():
    """Identical RNG split order: sampled streams reproduce generate()."""
    from llavamod_tpu.generation import generate_stream, truncate_at_stops

    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu")
    params = llava_mod.init(cfg, jax.random.PRNGKey(1))
    gcfg = GenerationConfig(max_new_tokens=9, temperature=0.8, top_k=50,
                            pad_token_id=0)
    batch = _tiny_batch(cfg, left_pad=0)
    rng = jax.random.PRNGKey(42)
    want = generate(params, cfg, batch, gcfg, rng=rng)
    chunks = list(generate_stream(params, cfg, batch, gcfg, rng=rng, chunk=3))
    got = truncate_at_stops(np.concatenate(chunks, axis=1), gcfg)
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_stream_stops_early_on_eos():
    """Once every row hits EOS the stream ends without decoding more chunks."""
    from llavamod_tpu.generation import generate_stream

    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu")
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    batch = _tiny_batch(cfg, left_pad=0)
    # find what greedy emits first, then declare THAT token the EOS
    probe = generate(params, cfg, batch,
                     GenerationConfig(max_new_tokens=1, pad_token_id=0))
    eos = int(probe[0, 0])
    gcfg = GenerationConfig(max_new_tokens=64, pad_token_id=0,
                            eos_token_ids=(eos,))
    chunks = list(generate_stream(params, cfg, batch, gcfg, chunk=4))
    total = sum(c.shape[1] for c in chunks)
    assert total < 64  # stopped well before max_new_tokens
