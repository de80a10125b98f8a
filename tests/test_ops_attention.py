"""Attention op tests: XLA reference vs dense math, flash kernel (interpret
mode on CPU) vs XLA reference, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llavamod_tpu.ops.attention import make_causal_mask, xla_attention
from llavamod_tpu.ops.flash_attention import flash_attention

pytestmark = pytest.mark.slow  # compile-heavy numerics; -m "not slow" skips


def _qkv(b=2, t=256, h=4, kh=2, d=128, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), dtype) * 0.5
    k = jax.random.normal(ks[1], (b, t, kh, d), dtype) * 0.5
    v = jax.random.normal(ks[2], (b, t, kh, d), dtype) * 0.5
    return q, k, v


def test_xla_attention_matches_naive():
    b, t, h, d = 1, 8, 2, 4
    q, k, v = _qkv(b, t, h, h, d)
    out = xla_attention(q, k, v, causal=True)
    # naive per-head computation
    for head in range(h):
        logits = (q[0, :, head] @ k[0, :, head].T) / np.sqrt(d)
        mask = np.tril(np.ones((t, t), bool))
        logits = np.where(mask, logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        expected = p @ v[0, :, head]
        np.testing.assert_allclose(out[0, :, head], expected, rtol=1e-5, atol=1e-6)


def test_causal_mask_decode_alignment():
    # during decode t=1, s=K: the single query attends to everything
    m = make_causal_mask(1, 5)
    assert m.shape == (1, 5)
    assert bool(m.all())


def test_gqa_grouping():
    q, k, v = _qkv(b=1, t=16, h=4, kh=2, d=8)
    out = xla_attention(q, k, v, causal=True)
    # manually repeat kv to full heads
    k_full = jnp.repeat(k, 2, axis=2)
    v_full = jnp.repeat(v, 2, axis=2)
    out_full = xla_attention(q, k_full, v_full, causal=True)
    np.testing.assert_allclose(out, out_full, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla(causal):
    q, k, v = _qkv(b=1, t=256, h=2, kh=2, d=128)
    out_f = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    out_x = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(out_f, out_x, rtol=2e-4, atol=2e-5)


def test_flash_gqa():
    q, k, v = _qkv(b=1, t=256, h=4, kh=2, d=128)
    out_f = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    out_x = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out_f, out_x, rtol=2e-4, atol=2e-5)


def test_flash_segment_ids():
    q, k, v = _qkv(b=2, t=256, h=2, kh=2, d=128)
    seg = jnp.concatenate([jnp.ones((2, 100), jnp.int32),
                           jnp.zeros((2, 156), jnp.int32)], axis=1)
    out_f = flash_attention(q, k, v, causal=True, segment_ids=(seg, seg),
                            block_q=128, block_k=128)
    mask = (seg[:, None, :, None] == seg[:, None, None, :]) & (
        seg[:, None, None, :] != 0)
    out_x = xla_attention(q, k, v, causal=True, mask=mask)
    np.testing.assert_allclose(out_f[:, :100], out_x[:, :100], rtol=2e-4, atol=2e-5)


def test_flash_backward_matches_xla():
    q, k, v = _qkv(b=1, t=256, h=2, kh=1, d=128, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       block_q=128, block_k=128) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4, err_msg=f"d{name}")


def test_flash_softcap():
    q, k, v = _qkv(b=1, t=128, h=2, kh=2, d=128, seed=5)
    out_f = flash_attention(q, k, v, causal=True, softcap=30.0,
                            block_q=128, block_k=128)
    out_x = xla_attention(q, k, v, causal=True, softcap=30.0)
    np.testing.assert_allclose(out_f, out_x, rtol=2e-4, atol=2e-5)


def test_flash_unaligned_seq_len():
    # t=200 not a multiple of the block — wrapper pads with segment 0
    q, k, v = _qkv(b=1, t=200, h=2, kh=2, d=128, seed=7)
    out_f = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    out_x = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out_f, out_x, rtol=2e-4, atol=2e-5)
