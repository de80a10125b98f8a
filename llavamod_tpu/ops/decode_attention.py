"""Pallas TPU flash-decode attention over the (optionally int8) KV cache.

The cached decode step (t == 1) is pure HBM bandwidth: every generated token
re-reads the whole KV cache once.  The XLA fallback (ops/attention.py) pays
2-3x that roofline on an int8 cache because the dequantized bf16 K/V and the
[B, H, 1, S] mask/probability tensors all materialize in HBM.  This kernel
streams the cache through VMEM exactly once per step in its STORED dtype:

  * int8 cache: blocks are dequantized in-register — the K scales fold into
    the logits rows, the V scales fold into the probability rows, so the
    only HBM reads are the s8 bytes plus the tiny f32 scale rows,
  * online softmax across S blocks (same scheme as ops/flash_attention.py),
    so no [.., S]-shaped intermediate ever leaves VMEM,
  * validity masking via the cache segment row (0 = empty/pad slot); a
    position-bounds mask guards ragged final blocks.

Decode attention is a batched MATVEC (every (batch, kv head) pair owns a
private K/V history), so the grid shape is chosen for DMA size and MXU
pipelining, not FLOPs: each grid step covers `block_b` batches x ALL KV
heads x an S block.  A head-per-grid-step layout measures ~2.3 us/step of
fixed overhead (88 GB/s at B=24/KH=16/S=768); packing the per-head matvecs
into one step lets Mosaic software-pipeline them back to back, and the
softmax runs once on the [KH*G, S-block] row stack instead of per head.

The cache layout is [B, KH, S, D] (see decoder.KVCache) so each (batch,
kv-head) tile is one contiguous DMA.

Replaces the reference's CUDA decode path for quantized caches
(qwen/cpp_kernels.py:39-55, modeling_qwen.py:308) with the TPU-native
equivalent; the reference's HF eval loop never even reaches a cached decode
(model_vqa_loader.py:128 disables use_cache).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128

DEFAULT_BLOCK_S = 1024
# per-operand VMEM budget for the K/V tiles: 2 operands x double buffering
# must stay under the 16 MB default scoped-vmem limit
_TILE_BYTES = 3 << 20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _decode_kernel(seg_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,  # inputs
                   o_ref,                                          # output
                   m_scr, l_scr, acc_scr,                          # scratch
                   *, scale: float, softcap: Optional[float],
                   quantized: bool, block_s: int, s_len: int,
                   block_b: int, kh: int, g: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    rows = kh * g  # all query heads of one batch element

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # int8 V converts to f32 exactly and p then stays full-precision (the
    # step is DMA-bound, the f32 MXU rate is irrelevant); float caches use
    # their own dtype for the probability operand, like the flash kernel.
    pv_t = jnp.float32 if v_ref.dtype == jnp.int8 else v_ref.dtype

    for bi in range(block_b):
        r0 = bi * rows
        # Stack every head's logits into [KH*G, Bs] and run the softmax
        # machinery once per batch element.
        s = jnp.concatenate(
            [jax.lax.dot_general(
                q_ref[bi, h_], k_ref[bi, h_].astype(q_ref.dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
             for h_ in range(kh)], axis=0) * scale      # [rows, Bs]
        if quantized:
            ks = ks_ref[bi, :, 0]                        # [KH, Bs]
            if g > 1:
                ks = jnp.repeat(ks, g, axis=0)
            s = s * ks
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap

        # Valid slots: nonzero cache segment AND inside the real S (the
        # final block may be ragged; OOB lanes hold unspecified pad data).
        cols = j * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = (seg_ref[bi] != 0) & (cols < s_len)       # [1, Bs] -> rows
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[r0:r0 + rows, :1]                 # [rows, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[r0:r0 + rows] = jnp.broadcast_to(
            l_scr[r0:r0 + rows, :1] * alpha +
            jnp.sum(p, axis=1, keepdims=True), (rows, l_scr.shape[1]))
        m_scr[r0:r0 + rows] = jnp.broadcast_to(m_new, (rows, m_scr.shape[1]))
        if quantized:
            vs = vs_ref[bi, :, 0]                        # [KH, Bs]
            if g > 1:
                vs = jnp.repeat(vs, g, axis=0)
            p = p * vs
        pv = jnp.concatenate(
            [jax.lax.dot(p[h_ * g:(h_ + 1) * g].astype(pv_t),
                         v_ref[bi, h_].astype(pv_t),
                         preferred_element_type=jnp.float32)
             for h_ in range(kh)], axis=0)               # [rows, D]
        acc_scr[r0:r0 + rows] = acc_scr[r0:r0 + rows] * alpha + pv

    @pl.when(j == nj - 1)
    def _finish():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out = acc_scr[:] / l_safe                        # [bb*rows, D]
        o_ref[...] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def flash_decode(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_seg: jnp.ndarray,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    block_s: int = DEFAULT_BLOCK_S,
    block_b: Optional[int] = None,
) -> jnp.ndarray:
    """flash-decode, batch-partitioned under an ambient mesh.

    GSPMD has no partitioning rule for a pallas_call, so under a mesh it
    would REPLICATE every operand — including the whole KV cache — per
    decode step (seen as "Involuntary full rematerialization" warnings in
    the multichip dryrun).  When a mesh with data/fsdp axes is ambient and
    they divide B, re-enter through shard_map so each device runs the
    kernel on its own batch shard; otherwise fall through to the plain
    single-device call."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is not None and not mesh.empty:
        import numpy as _np
        from jax.sharding import PartitionSpec as P

        batch_axes = tuple(a for a in ("data", "fsdp")
                           if a in mesh.axis_names)
        n = (int(_np.prod([mesh.shape[a] for a in batch_axes]))
             if batch_axes else 1)
        if n > 1 and q.shape[0] % n == 0:
            args = [q, k, v, kv_seg]
            if k_scale is not None:
                args += [k_scale, v_scale]
            specs = tuple(P(batch_axes, *([None] * (a.ndim - 1)))
                          for a in args)

            def inner(*xs):
                if len(xs) == 6:
                    q_, k_, v_, seg_, ks_, vs_ = xs
                else:
                    (q_, k_, v_, seg_), ks_, vs_ = xs, None, None
                return _flash_decode_local(
                    q_, k_, v_, kv_seg=seg_, k_scale=ks_, v_scale=vs_,
                    scale=scale, softcap=softcap, block_s=block_s,
                    block_b=block_b)

            # check_vma=False: pallas_call outputs carry no varying-mesh-
            # axes annotation, which the checker would require
            return jax.shard_map(inner, mesh=mesh, in_specs=specs,
                                 out_specs=specs[0],
                                 check_vma=False)(*args)
    return _flash_decode_local(q, k, v, kv_seg=kv_seg, k_scale=k_scale,
                               v_scale=v_scale, scale=scale, softcap=softcap,
                               block_s=block_s, block_b=block_b)


def _flash_decode_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_seg: jnp.ndarray,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    block_s: int = DEFAULT_BLOCK_S,
    block_b: Optional[int] = None,
) -> jnp.ndarray:
    """Single-step cached attention.

    q:       [B, H, D] current-token queries.
    k, v:    [B, KH, S, D] cache — int8 iff k_scale/v_scale given, else
             any float dtype (read as-is).
    k_scale, v_scale: [B, KH, S] f32 per-slot dequantization scales.
    kv_seg:  [B, S] int32 cache segment row; 0 marks empty/pad slots.
             (Causality is implied: slots at positions not yet written are
             still 0 — decoder.init_cache zero-fills.)
    scale:   logit scale (default D**-0.5).
    block_b: batch elements per grid step (default: largest divisor of B
             whose K tile fits the VMEM budget).
    Returns [B, H, D] in q.dtype.
    """
    b, h, d = q.shape
    kh, s_len = k.shape[1], k.shape[2]
    g = h // kh
    scale = d ** -0.5 if scale is None else scale
    quantized = k_scale is not None

    qg = q.reshape(b, kh, g, d)
    # Mosaic block rule: a block's minor dim must be a multiple of 128 or
    # span the full array dim.  S is a lane dim for seg/scales, so either
    # tile in 128-multiples or take the whole row in one block.
    if s_len % LANES == 0:
        block_s = min(block_s, s_len)
        block_s -= block_s % LANES
    else:
        block_s = s_len
    nj = pl.cdiv(s_len, block_s)
    if block_b is None:
        row_bytes = kh * block_s * d * k.dtype.itemsize
        block_b = max(1, _TILE_BYTES // row_bytes)
    block_b = min(block_b, b)
    while b % block_b:
        block_b -= 1
    grid = (b // block_b, nj)

    base = functools.partial(
        _decode_kernel, scale=scale, softcap=softcap, quantized=quantized,
        block_s=block_s, s_len=s_len, block_b=block_b, kh=kh, g=g)
    in_specs = [
        pl.BlockSpec((block_b, 1, block_s), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),            # kv_seg [B,1,S]
        pl.BlockSpec((block_b, kh, g, d), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),            # q
        pl.BlockSpec((block_b, kh, block_s, d), lambda i, j: (i, 0, j, 0),
                     memory_space=pltpu.VMEM),            # k
        pl.BlockSpec((block_b, kh, block_s, d), lambda i, j: (i, 0, j, 0),
                     memory_space=pltpu.VMEM),            # v
    ]
    operands = [kv_seg.astype(jnp.int32)[:, None, :], qg, k, v]
    if quantized:
        scale_spec = pl.BlockSpec((block_b, kh, 1, block_s),
                                  lambda i, j: (i, 0, 0, j),
                                  memory_space=pltpu.VMEM)
        in_specs += [scale_spec, scale_spec]
        operands += [k_scale[:, :, None, :], v_scale[:, :, None, :]]
        kernel = base
    else:
        def kernel(seg_ref, q_ref, k_ref, v_ref, *rest):
            base(seg_ref, q_ref, k_ref, v_ref, None, None, *rest)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, kh, g, d), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, kh, g, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_b * kh * g, LANES), jnp.float32),
            pltpu.VMEM((block_b * kh * g, LANES), jnp.float32),
            pltpu.VMEM((block_b * kh * g, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(*operands)
    return out.reshape(b, h, d)
