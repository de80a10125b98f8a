"""Pallas TPU flash attention (forward + backward).

Online-softmax tiled attention that never materializes the [T, S] score
matrix in HBM.  Replaces the CUDA flash-attn / vendored Triton kernel the
reference depends on (SURVEY.md §2.9; reference
model/language_model/mpt/flash_attn_triton.py, modeling_flash_attention_utils.py).

Design:
  * layout [B, T, H, D] at the API, [B, H, T, D] inside the kernels,
  * grid (B, H, num_q_blocks, num_kv_blocks) with the KV dimension innermost
    (sequential on TPU) so the running max / sum / output accumulator live in
    VMEM scratch across KV steps,
  * GQA by indexing the KV head as h * KH // H in the BlockSpec index map —
    K/V are never repeated in memory,
  * causal + segment-id masking fused into the score tile; fully-masked
    causal tiles are skipped with @pl.when,
  * TPU tiling: the fp32 logsumexp residual and the dO·O row-sums are stored
    lane-replicated as [B, H, T, 128] (the (8,128) min-tile rule forbids
    narrower trailing dims); segment ids are lane-/sublane-expanded the same
    way,
  * backward: dq in one kernel (KV innermost), dk/dv in a second kernel
    (q-block x grouped-q-head innermost) — both recompute p from q, k and
    the saved logsumexp.

Varlen batches are expressed with segment ids (0 = padding), which subsumes
the reference's unpad/repad machinery (modeling_flash_attention_utils.py:184-300).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128
SUBLANES = 8

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def _blocks(t: int, b: int) -> int:
    return pl.cdiv(t, b)


def _mask_tile(i, j, q_seg_ref, kv_seg_ref, shape, *, causal, use_segs,
               block_q, block_k):
    mask = None
    if causal:
        rows = i * block_q + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = j * block_k + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        mask = cols <= rows
    if use_segs:
        qs = q_seg_ref[0][:, :1]    # [Bq, 1]
        ks = kv_seg_ref[0][:1, :]   # [1, Bk]
        seg = (qs == ks) & (ks != 0)
        mask = seg if mask is None else (mask & seg)
    return mask


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref,  # inputs
                o_ref, lse_ref,                               # outputs
                m_scr, l_scr, acc_scr,                        # scratch
                *, causal: bool, scale: float, softcap: Optional[float],
                block_q: int, block_k: int, use_segs: bool):
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Skip tiles strictly above the causal diagonal.
    run = (j * block_k <= i * block_q + block_q - 1) if causal else True

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]                       # [Bq, D]
        k = k_ref[0, 0]                       # [Bk, D]
        v = v_ref[0, 0]                       # [Bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                             # [Bq, Bk]
        if softcap is not None:
            s = jnp.tanh(s / softcap) * softcap

        mask = _mask_tile(i, j, q_seg_ref, kv_seg_ref, s.shape, causal=causal,
                          use_segs=use_segs, block_q=block_q, block_k=block_k)
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]                 # [Bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)       # [Bq, 1]
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        # logsumexp residual, lane-replicated; all-pad rows stay NEG_INF
        lse = jnp.where(l == 0.0, NEG_INF, m_scr[:, :1] + jnp.log(l_safe))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _seg_specs(block_q, block_k):
    q_spec = pl.BlockSpec((1, block_q, LANES), lambda b_, h_, i, j: (b_, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, SUBLANES, block_k), lambda b_, h_, i, j: (b_, 0, j),
                           memory_space=pltpu.VMEM)
    return q_spec, kv_spec


def _expand_segs(q_seg, kv_seg):
    b, t = q_seg.shape
    s = kv_seg.shape[1]
    q3 = jax.lax.broadcast_in_dim(q_seg.astype(jnp.int32), (b, t, LANES), (0, 1))
    kv3 = jax.lax.broadcast_in_dim(kv_seg.astype(jnp.int32), (b, SUBLANES, s), (0, 2))
    return q3, kv3


def _fwd(q, k, v, q_seg, kv_seg, *, causal, scale, softcap, block_q, block_k):
    b, h, t, d = q.shape
    s_len, kh = k.shape[2], k.shape[1]
    grid = (b, h, _blocks(t, block_q), _blocks(s_len, block_k))
    use_segs = q_seg is not None
    if not use_segs:
        q_seg = jnp.ones((b, t), jnp.int32)
        kv_seg = jnp.ones((b, s_len), jnp.int32)
    q3, kv3 = _expand_segs(q_seg, kv_seg)

    kernel = functools.partial(
        _fwd_kernel, causal=causal, scale=scale, softcap=softcap,
        block_q=block_q, block_k=block_k, use_segs=use_segs)

    seg_q_spec, seg_kv_spec = _seg_specs(block_q, block_k)

    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            seg_q_spec,
            seg_kv_spec,
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, i, j: (b_, h_ * kh // h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, i, j: (b_, h_ * kh // h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, LANES),
                         lambda b_, h_, i, j: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(q3, kv3, q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _recompute_p(q, k, lse_col, i, j, q_seg_ref, kv_seg_ref, *,
                 causal, scale, softcap, block_q, block_k, use_segs):
    """Recompute the probability tile p = exp(s - lse); also return raw s."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    capped = s
    if softcap is not None:
        capped = jnp.tanh(s / softcap) * softcap
    mask = _mask_tile(i, j, q_seg_ref, kv_seg_ref, s.shape, causal=causal,
                      use_segs=use_segs, block_q=block_q, block_k=block_k)
    p = jnp.exp(capped - lse_col)
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    return p, s


def _softcap_chain(s_raw, softcap):
    if softcap is None:
        return 1.0
    th = jnp.tanh(s_raw / softcap)
    return 1.0 - th * th


def _dq_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
               delta_ref, dq_ref, dq_scr,
               *, causal, scale, softcap, block_q, block_k, use_segs):
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run = (j * block_k <= i * block_q + block_q - 1) if causal else True

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_col = lse_ref[0, 0][:, :1]
        delta_col = delta_ref[0, 0][:, :1]
        p, s_raw = _recompute_p(q, k, lse_col, i, j, q_seg_ref, kv_seg_ref,
                                causal=causal, scale=scale, softcap=softcap,
                                block_q=block_q, block_k=block_k,
                                use_segs=use_segs)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_col)
        ds = ds * _softcap_chain(s_raw, softcap) * scale
        dq_scr[:] += jax.lax.dot(ds.astype(k.dtype), k,
                                 preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                *, causal, scale, softcap, block_q, block_k, use_segs,
                q_heads_per_kv):
    # grid: (b, kv_head, j, inner) with inner = i * g + g_idx
    j = pl.program_id(2)
    inner = pl.program_id(3)
    n_inner = pl.num_programs(3)
    i = inner // q_heads_per_kv

    @pl.when(inner == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run = (j * block_k <= i * block_q + block_q - 1) if causal else True

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_col = lse_ref[0, 0][:, :1]
        delta_col = delta_ref[0, 0][:, :1]
        p, s_raw = _recompute_p(q, k, lse_col, i, j, q_seg_ref, kv_seg_ref,
                                causal=causal, scale=scale, softcap=softcap,
                                block_q=block_q, block_k=block_k,
                                use_segs=use_segs)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_col)
        ds = ds * _softcap_chain(s_raw, softcap) * scale
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(inner == n_inner - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd(res, g, *, causal, scale, softcap, block_q, block_k):
    q, k, v, q_seg, kv_seg, o, lse = res
    do = g
    b, h, t, d = q.shape
    kh, s_len = k.shape[1], k.shape[2]
    g_heads = h // kh
    use_segs = q_seg is not None
    if not use_segs:
        q_seg = jnp.ones((b, t), jnp.int32)
        kv_seg = jnp.ones((b, s_len), jnp.int32)
    q3, kv3 = _expand_segs(q_seg, kv_seg)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jax.lax.broadcast_in_dim(delta, (b, h, t, LANES), (0, 1, 2))

    common = dict(causal=causal, scale=scale, softcap=softcap,
                  block_q=block_q, block_k=block_k, use_segs=use_segs)

    nq, nk = _blocks(t, block_q), _blocks(s_len, block_k)
    seg_q_spec, seg_kv_spec = _seg_specs(block_q, block_k)

    def q_spec4(idx):
        return pl.BlockSpec((1, 1, block_q, d), idx, memory_space=pltpu.VMEM)

    def kv_spec4(idx):
        return pl.BlockSpec((1, 1, block_k, d), idx, memory_space=pltpu.VMEM)

    def lm_spec(idx):
        return pl.BlockSpec((1, 1, block_q, LANES), idx, memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(b, h, nq, nk),
        in_specs=[
            seg_q_spec,
            seg_kv_spec,
            q_spec4(lambda b_, h_, i, j: (b_, h_, i, 0)),
            kv_spec4(lambda b_, h_, i, j: (b_, h_ * kh // h, j, 0)),
            kv_spec4(lambda b_, h_, i, j: (b_, h_ * kh // h, j, 0)),
            q_spec4(lambda b_, h_, i, j: (b_, h_, i, 0)),
            lm_spec(lambda b_, h_, i, j: (b_, h_, i, 0)),
            lm_spec(lambda b_, h_, i, j: (b_, h_, i, 0)),
        ],
        out_specs=q_spec4(lambda b_, h_, i, j: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=_interpret(),
    )(q3, kv3, q, k, v, do, lse, delta)

    # dk/dv: inner grid walks (q block, q head within the GQA group).
    n_inner = nq * g_heads

    def kv_idx(b_, kh_, j, inner):
        return (b_, kh_, j, 0)

    def q_idx(b_, kh_, j, inner):
        return (b_, kh_ * g_heads + inner % g_heads, inner // g_heads, 0)

    def lm_idx(b_, kh_, j, inner):
        return (b_, kh_ * g_heads + inner % g_heads, inner // g_heads, 0)

    seg_q_bwd = pl.BlockSpec((1, block_q, LANES),
                             lambda b_, kh_, j, inner: (b_, inner // g_heads, 0),
                             memory_space=pltpu.VMEM)
    seg_kv_bwd = pl.BlockSpec((1, SUBLANES, block_k),
                              lambda b_, kh_, j, inner: (b_, 0, j),
                              memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common, q_heads_per_kv=g_heads),
        grid=(b, kh, nk, n_inner),
        in_specs=[
            seg_q_bwd,
            seg_kv_bwd,
            q_spec4(q_idx),
            kv_spec4(kv_idx),
            kv_spec4(kv_idx),
            q_spec4(q_idx),
            lm_spec(lm_idx),
            lm_spec(lm_idx),
        ],
        out_specs=[kv_spec4(kv_idx), kv_spec4(kv_idx)],
        out_shape=[
            jax.ShapeDtypeStruct((b, kh, s_len, d), k.dtype),
            jax.ShapeDtypeStruct((b, kh, s_len, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(q3, kv3, q, k, v, do, lse, delta)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _pad_to(x, axis, mult, value=0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(q, k, v, q_seg, kv_seg, causal, scale, softcap, block_q, block_k):
    o, _ = _fwd(q, k, v, q_seg, kv_seg, causal=causal, scale=scale,
                softcap=softcap, block_q=block_q, block_k=block_k)
    return o


def _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, softcap, block_q, block_k):
    o, lse = _fwd(q, k, v, q_seg, kv_seg, causal=causal, scale=scale,
                  softcap=softcap, block_q=block_q, block_k=block_k)
    return o, (q, k, v, q_seg, kv_seg, o, lse)


def _flash_bwd(causal, scale, softcap, block_q, block_k, res, g):
    dq, dk, dv = _bwd(res, g, causal=causal, scale=scale, softcap=softcap,
                      block_q=block_q, block_k=block_k)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask=None,  # only segment-id masks are supported on this path
    segment_ids: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Flash attention. q: [B,T,H,D]; k,v: [B,S,KH,D]. Returns [B,T,H,D].

    Padding/varlen is expressed via segment_ids=(q_seg [B,T], kv_seg [B,S]);
    dense `mask` tensors are not supported here (use impl='xla').
    """
    if mask is not None:
        raise ValueError("flash_attention takes segment_ids, not dense masks")
    b, t, h, d = q.shape
    s_len = k.shape[1]
    scale = d ** -0.5 if scale is None else scale
    block_q = min(block_q, max(128, t))
    block_k = min(block_k, max(128, s_len))

    qt = jnp.swapaxes(q, 1, 2)  # [B,H,T,D]
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    q_seg = kv_seg = None
    pad_t = (-t) % block_q
    pad_s = (-s_len) % block_k
    if segment_ids is not None:
        q_seg, kv_seg = segment_ids
    if pad_t or pad_s or segment_ids is not None:
        if q_seg is None:
            q_seg = jnp.ones((b, t), jnp.int32)
            kv_seg = jnp.ones((b, s_len), jnp.int32)
        q_seg = _pad_to(q_seg.astype(jnp.int32), 1, block_q, 0)
        kv_seg = _pad_to(kv_seg.astype(jnp.int32), 1, block_k, 0)
        qt = _pad_to(qt, 2, block_q)
        kt = _pad_to(kt, 2, block_k)
        vt = _pad_to(vt, 2, block_k)

    o = _flash(qt, kt, vt, q_seg, kv_seg, causal, scale, softcap,
               block_q, block_k)
    if pad_t:
        o = o[:, :, :t]
    return jnp.swapaxes(o, 1, 2)
