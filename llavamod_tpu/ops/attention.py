"""Attention ops.

`dot_product_attention` is the single entry point used by every model in the
framework (the reference instead carries per-family attention copies plus
flash-attn CUDA / Triton kernels — see SURVEY.md §2.9).  Two implementations:

  * 'xla'   — einsum + fp32 softmax reference path (runs anywhere, used for
              decode steps and CPU tests).
  * 'flash' — Pallas TPU flash-attention kernel (ops/flash_attention.py),
              used for long-sequence training/prefill on TPU.

GQA is handled by logical head grouping, never by materializing repeated K/V.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite "-inf" that keeps softmax numerics safe in bf16/fp32


def _gqa_group(q: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    """[B,T,H,D] -> [B,T,KH,G,D] logical grouping for GQA."""
    b, t, h, d = q.shape
    return q.reshape(b, t, num_kv_heads, h // num_kv_heads, d)


def make_causal_mask(t: int, s: int, dtype=jnp.bool_) -> jnp.ndarray:
    """[t, s] lower-triangular mask aligned to the *end* (decode-friendly):
    query i attends to kv j iff j - (s - t) <= i."""
    qi = jnp.arange(t)[:, None] + (s - t)
    kj = jnp.arange(s)[None, :]
    return (kj <= qi).astype(dtype)


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    kv_layout: str = "bskd",
) -> jnp.ndarray:
    """Reference attention.  q:[B,T,H,D] k,v:[B,S,KH,D] -> [B,T,H,D].

    mask: broadcastable to [B, 1|H, T, S], True = attend.
    bias: broadcastable additive bias (same shape rules).
    kv_layout: 'bskd' (default) or 'bksd' (the head-major KV-cache layout —
    the einsums contract it directly, no transpose materializes).
    """
    b, t, h, d = q.shape
    if kv_layout == "bskd":
        s, kh = k.shape[1], k.shape[2]
    else:
        kh, s = k.shape[1], k.shape[2]
    scale = d ** -0.5 if scale is None else scale

    qg = _gqa_group(q, kh)  # [B,T,KH,G,D]
    logits = jnp.einsum(f"btkgd,{kv_layout}->bkgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        logits = jnp.tanh(logits / softcap) * softcap
    logits = logits.reshape(b, h, t, s)

    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        cm = make_causal_mask(t, s)
        logits = jnp.where(cm[None, None], logits, NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    pg = probs.reshape(b, kh, h // kh, t, s)
    out = jnp.einsum(f"bkgts,{kv_layout}->btkgd", pg, v)
    return out.reshape(b, t, h, d)


def _flash_under_mesh(call, q, k, v, segment_ids):
    """Run the Pallas flash kernel per-shard under an ambient mesh.

    GSPMD has no partitioning rule for a pallas_call, so under a mesh it
    would replicate every operand (the same failure flash_decode works
    around, ops/decode_attention.py:144-183).  Attention is independent
    per batch row and per head, so when the mesh's batch axes
    ('data'/'fsdp') divide B and the 'tensor' axis divides both H and KH,
    re-enter through jax.shard_map with the batch dim over the batch axes
    and the HEAD dims over 'tensor' — exact, and it also makes the kernel
    legal inside a partially-manual region (the GPipe pipeline's
    pipe-manual shard_map, parallel/pipeline.py): only non-Manual axes
    are named.  Sequence-sharded ('seq') inputs are gathered by the
    shard_map boundary (flash needs the whole causal sequence).

    Returns the [B, T, H, D] output, or None to fall through to the
    plain single-device call."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return None
    from jax.sharding import AxisType
    from jax.sharding import PartitionSpec as P

    types = dict(zip(mesh.axis_names, mesh.axis_types))

    def usable(name):
        return (name in mesh.axis_names and types[name] != AxisType.Manual
                and int(mesh.shape[name]) > 1)

    batch_axes = tuple(a for a in ("data", "fsdp") if usable(a))
    head_axes = tuple(a for a in ("tensor",) if usable(a))
    nb = 1
    for a in batch_axes:
        nb *= int(mesh.shape[a])
    nh = 1
    for a in head_axes:
        nh *= int(mesh.shape[a])
    if nb * nh == 1:
        return None
    if q.shape[0] % nb or q.shape[2] % nh or k.shape[2] % nh:
        return None

    bspec = batch_axes if batch_axes else None
    hspec = head_axes[0] if head_axes else None
    qs = P(bspec, None, hspec, None)

    args = [q, k, v]
    specs = [qs, qs, qs]
    if segment_ids is not None:
        args += list(segment_ids)            # (q_seg [B,T], kv_seg [B,S])
        specs += [P(bspec, None), P(bspec, None)]

    def inner(*xs):
        if len(xs) == 5:
            q_, k_, v_, qseg_, kvseg_ = xs
            return call(q_, k_, v_, (qseg_, kvseg_))
        return call(*xs, None)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the checker would require
    return jax.shard_map(
        inner, mesh=mesh, in_specs=tuple(specs), out_specs=qs,
        check_vma=False, axis_names=set(batch_axes) | set(head_axes),
    )(*args)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    segment_ids: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    impl: str = "auto",
    kv_layout: str = "bskd",
) -> jnp.ndarray:
    """Dispatching attention entry point.

    segment_ids: (q_seg [B,T], kv_seg [B,S]) — tokens attend only within equal
    nonzero segment ids (0 = padding).  Composes with `causal`.
    kv_layout: 'bskd' | 'bksd' (xla impl only; flash requires 'bskd').
    """
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        # flash kernel pays off for real training/prefill tiles; head_dim 64
        # works too (Mosaic lane-pads the minor dim — verified on v5e)
        use_flash = (on_tpu and q.shape[1] >= 128 and bias is None
                     and mask is None and q.shape[-1] % 64 == 0)
        impl = "flash" if use_flash else "xla"

    if impl == "flash":
        assert kv_layout == "bskd", "flash kernel takes [B,S,KH,D] K/V"
        import os

        from llavamod_tpu.ops.flash_attention import (
            DEFAULT_BLOCK_K,
            DEFAULT_BLOCK_Q,
            flash_attention,
        )

        # tuning knobs (read at trace time): sweep block sizes per workload
        bq = int(os.environ.get("LLAVAMOD_FLASH_BLOCK_Q", DEFAULT_BLOCK_Q))
        bk = int(os.environ.get("LLAVAMOD_FLASH_BLOCK_K", DEFAULT_BLOCK_K))

        def call(q_, k_, v_, segs_):
            return flash_attention(q_, k_, v_, segment_ids=segs_,
                                   causal=causal, scale=scale,
                                   softcap=softcap, block_q=bq, block_k=bk)

        sharded = _flash_under_mesh(call, q, k, v, segment_ids)
        if sharded is not None:
            return sharded
        return call(q, k, v, segment_ids)

    if segment_ids is not None:
        q_seg, kv_seg = segment_ids
        seg_mask = (q_seg[:, None, :, None] == kv_seg[:, None, None, :]) & (
            kv_seg[:, None, None, :] != 0
        )
        mask = seg_mask if mask is None else (mask & seg_mask)
    return xla_attention(q, k, v, bias=bias, mask=mask, causal=causal,
                         scale=scale, softcap=softcap, kv_layout=kv_layout)
