"""flash_decode (ops/decode_attention.py) vs a NumPy oracle.

Covers: bf16 and int8 caches (scales folded into logits/probabilities),
GQA grouping, logit softcap, segment masking (left padding + empty tail
slots), ragged S (non-multiple of 128 -> single-block path), and block_b
batching.  The kernel runs in interpret mode on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from llavamod_tpu.ops.decode_attention import flash_decode

pytestmark = pytest.mark.slow  # compile-heavy numerics; -m "not slow" skips


def _oracle(q, k, v, seg, scale, softcap=None, ks=None, vs=None):
    b, h, d = q.shape
    kh, s = k.shape[1], k.shape[2]
    g = h // kh
    kf = k.astype(np.float32) * (ks[..., None] if ks is not None else 1.0)
    vf = v.astype(np.float32) * (vs[..., None] if vs is not None else 1.0)
    qg = q.astype(np.float32).reshape(b, kh, g, d)
    logits = np.einsum("bkgd,bksd->bkgs", qg, kf) * scale
    if softcap:
        logits = np.tanh(logits / softcap) * softcap
    logits = np.where(seg[:, None, None, :] != 0, logits, -1e30)
    m = logits.max(-1, keepdims=True)
    p = np.exp(logits - m)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bkgs,bksd->bkgd", p, vf).reshape(b, h, d)


def _quant(x):
    amax = np.abs(x).max(-1)
    s = np.maximum(amax / 127.0, 1e-8).astype(np.float32)
    return np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8), s


CASES = [
    # B, H, KH, S, D, softcap, block_s, block_b
    (2, 8, 8, 96, 64, None, 96, None),      # ragged S -> single block
    (2, 8, 4, 100, 64, None, 32, None),     # GQA g=2, ragged S
    (3, 16, 16, 768, 128, 30.0, 256, 3),    # softcap + multi-block S
    (4, 8, 2, 512, 128, None, 128, 2),      # MQA-ish g=4
]


@pytest.mark.parametrize("b,h,kh,s,d,softcap,bs,bb", CASES)
@pytest.mark.parametrize("quantized", [False, True])
def test_flash_decode_vs_oracle(b, h, kh, s, d, softcap, bs, bb, quantized):
    rng = np.random.RandomState(0)
    q = rng.randn(b, h, d).astype(np.float32)
    k = rng.randn(b, kh, s, d).astype(np.float32)
    v = rng.randn(b, kh, s, d).astype(np.float32)
    # left padding + empty (unwritten) tail, as during real decode
    seg = np.ones((b, s), np.int32)
    seg[:, :3] = 0
    seg[:, -5:] = 0
    scale = d ** -0.5

    if quantized:
        kq, ks = _quant(k)
        vq, vs = _quant(v)
        out = flash_decode(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(kq), jnp.asarray(vq),
            kv_seg=jnp.asarray(seg), k_scale=jnp.asarray(ks),
            v_scale=jnp.asarray(vs), scale=scale, softcap=softcap,
            block_s=bs, block_b=bb)
        ref = _oracle(q, kq, vq, seg, scale, softcap, ks=ks, vs=vs)
    else:
        out = flash_decode(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), kv_seg=jnp.asarray(seg),
            scale=scale, softcap=softcap, block_s=bs, block_b=bb)
        ref = _oracle(q, k, v, seg, scale, softcap)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=0.06)


def test_flash_decode_fp32_cache_tight():
    """fp32 cache keeps fp32 accuracy (the PV dot stays full precision)."""
    rng = np.random.RandomState(1)
    b, h, kh, s, d = 2, 4, 4, 256, 64
    q = rng.randn(b, h, d).astype(np.float32)
    k = rng.randn(b, kh, s, d).astype(np.float32)
    v = rng.randn(b, kh, s, d).astype(np.float32)
    seg = np.ones((b, s), np.int32)
    out = flash_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                       kv_seg=jnp.asarray(seg), scale=d ** -0.5)
    ref = _oracle(q, k, v, seg, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-5)
