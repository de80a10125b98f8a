"""Training losses, built around vocab-chunked logit computation.

The reference materializes fp32 [B, T, 151936] probability tensors for the
distillation KL (align_trainer.py:455-528) — ~2.4 GB of activations per
forward at B*T=4096.  Here the LM head matmul, softmax statistics, and loss
contraction are fused into a `lax.scan` over vocab chunks with custom VJPs,
so peak memory per side is O(B*T*chunk) and the chunk matmuls run on the MXU.

Semantics parity:
  * kd_align_loss        == compute_align_loss (align_trainer.py:503-528):
      -sum_v p_teacher(v) * logp_student(v), same-position (no shift),
      token-mean over mask, vocab sliced to the shared prefix (the
      reference's hard-coded [:151936]).
  * softmax_cross_entropy== HF CausalLM CE (shift done by the caller).
  * sequence_log_prob    == DPOTrainer.get_logp (dpo_trainer.py:462-495).
  * dpo_loss             == DPOTrainer.dpo_loss (dpo_trainer.py:497-562),
      loss types sigmoid / hinge / ipo / kto_pair.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_CHUNK = 8192


def _num_chunks(v: int, chunk: int) -> int:
    return -(-v // chunk)


def _chunk_logits(h, w_chunk):
    """h [N, D] x w_chunk [C, D] -> [N, C] fp32 logits."""
    return jax.lax.dot_general(
        h, w_chunk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _head_rows(w) -> int:
    """Vocab-row count of a head weight (plain [V, D] array or int8 dict)."""
    return w["w_int8"].shape[0] if isinstance(w, dict) else w.shape[0]


def _rowquant(h):
    """[N, D] float -> ([N, D] int8, [N] fp32): dynamic per-row symmetric."""
    s = jnp.maximum(
        jnp.max(jnp.abs(h.astype(jnp.float32)), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(h.astype(jnp.float32) / s[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def _prep_head_stream(h, w, vocab_limit: int, chunk: int):
    """Build the per-chunk logit computation for one (hidden, head) pair.

    Returns (logit_fn, xs, nc): `xs` is the pytree scanned over (leading
    axis nc = number of vocab chunks) and `logit_fn(xs_chunk) -> [N, C]`
    fp32 logits.

    Plain [V, D] head -> bf16 MXU matmul.  int8 head (the dict layout of
    decoder.quantize_dense_int8, per-vocab-row scales) -> the hidden states
    are dynamically row-quantized ONCE here and each chunk runs on the int8
    MXU at 2x bf16 peak — used for the frozen distillation teacher, whose
    head matmul is recomputed in the loss backward and would otherwise be
    the single largest teacher cost (2 full [N, D_t] x [D_t, V] passes)."""
    if isinstance(w, dict) and "w_int8" in w:
        hq, hs = _rowquant(h)
        nc = _num_chunks(vocab_limit, chunk)
        wq = w["w_int8"][:vocab_limit]
        sw = w["scale"][:vocab_limit].astype(jnp.float32)
        pad = (-vocab_limit) % chunk
        if pad:
            wq = jnp.pad(wq, ((0, pad), (0, 0)))
            sw = jnp.pad(sw, ((0, pad),))
        xs = {"w": wq.reshape(nc, chunk, -1), "s": sw.reshape(nc, chunk)}

        def logit_fn(xs_c):
            y = jax.lax.dot_general(hq, xs_c["w"], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * hs[:, None] * xs_c["s"][None, :]

        return logit_fn, xs, nc
    wp, nc = _pad_vocab(w, vocab_limit, chunk)
    xs = {"w": wp.reshape(nc, chunk, -1)}
    return (lambda xs_c: _chunk_logits(h, xs_c["w"])), xs, nc


def _pad_vocab(w: jnp.ndarray, vocab_limit: int, chunk: int) -> Tuple[jnp.ndarray, int]:
    """Slice the head weight to vocab_limit rows and pad to a chunk multiple."""
    w = w[:vocab_limit]
    pad = (-vocab_limit) % chunk
    if pad:
        w = jnp.pad(w, ((0, pad), (0, 0)))
    return w, _num_chunks(vocab_limit, chunk)


def _valid_cols(chunk_idx: int, chunk: int, vocab_limit: int, n: int):
    """Bool [1, C]: which columns of this chunk are real vocab entries."""
    cols = chunk_idx * chunk + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    return cols < vocab_limit


# ---------------------------------------------------------------------------
# chunked logsumexp + label-logit gather  (CE and DPO building block)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def chunked_lse_and_gather(h, w, ids, vocab_limit: int,
                           chunk: int = DEFAULT_CHUNK,
                           stream_dh: bool = False):
    """Compute (logsumexp over vocab, logit of `ids`) without materializing
    full logits.

    h: [N, D] hidden states; w: [V, D] LM head (embedding layout);
    ids: [N] int32 target token ids (must be < vocab_limit).
    Returns (lse [N] fp32, picked [N] fp32).

    stream_dh=True — FROZEN-HEAD contract (the caller must guarantee the
    head weight receives no updates; steps.py derives this from the
    trainable mask): the forward ALSO streams the softmax-weighted head
    average p@W, so the backward is elementwise —
    dh = g_lse * (p@W) + g_picked * W[ids] — and never re-touches the
    head (saves one full [N, D] x [D, V] logit pass); dw is the exact
    zero a frozen head's stop_gradient would produce anyway.  The
    identity dh = ds@W with ds = g_lse*p + g_picked*onehot makes this
    EXACT, not an estimate (same matmul dtype class as the two-pass
    path)."""
    return _lse_gather_fwd_impl(h, w, ids, vocab_limit, chunk)


def _lse_gather_fwd_impl(h, w, ids, vocab_limit, chunk):
    n, d = h.shape
    logit_fn, xs, nc = _prep_head_stream(h, w, vocab_limit, chunk)

    def step(carry, w_chunk_and_idx):
        m, l, picked = carry
        w_chunk, c_idx = w_chunk_and_idx
        s = logit_fn(w_chunk)                               # [N, C]
        s = jnp.where(_valid_cols(c_idx, chunk, vocab_limit, n), s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new[:, None]), axis=1)
        # gather the label logit if it falls in this chunk
        local = ids - c_idx * chunk
        in_chunk = (local >= 0) & (local < chunk)
        got = jnp.take_along_axis(s, jnp.clip(local, 0, chunk - 1)[:, None], axis=1)[:, 0]
        picked = jnp.where(in_chunk, got, picked)
        return (m_new, l, picked), None

    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    (m, l, picked), _ = jax.lax.scan(step, init, (xs, jnp.arange(nc)))
    lse = m + jnp.log(l)
    return lse, picked




def _lse_gather_fwd_streamed(h, w, ids, vocab_limit, chunk):
    """Forward that also accumulates p@W and gathers W[ids] (frozen-head
    streamed backward; see chunked_lse_and_gather)."""
    n, d = h.shape
    logit_fn, xs, nc = _prep_head_stream(h, w, vocab_limit, chunk)

    def step(carry, w_chunk_and_idx):
        m, l, picked, acc = carry
        w_chunk, c_idx = w_chunk_and_idx
        s = logit_fn(w_chunk)
        s = jnp.where(_valid_cols(c_idx, chunk, vocab_limit, n), s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        res = jnp.exp(m - m_new)
        es = jnp.exp(s - m_new[:, None])
        l = l * res + jnp.sum(es, axis=1)
        local = ids - c_idx * chunk
        in_chunk = (local >= 0) & (local < chunk)
        got = jnp.take_along_axis(
            s, jnp.clip(local, 0, chunk - 1)[:, None], axis=1)[:, 0]
        picked = jnp.where(in_chunk, got, picked)
        acc = acc * res[:, None] + _acc_matmul(es, w_chunk, False)
        return (m_new, l, picked, acc), None

    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n, d), jnp.float32))
    (m, l, picked, acc), _ = jax.lax.scan(step, init, (xs, jnp.arange(nc)))
    lse = m + jnp.log(l)
    ps_w = acc / l[:, None]
    if isinstance(w, dict):
        w_rows = _gather_head_rows(w, ids)
    else:
        w_rows = jnp.take(w[:vocab_limit], jnp.clip(ids, 0, vocab_limit - 1),
                          axis=0).astype(jnp.float32)
    return lse, picked, ps_w, w_rows


def _lse_gather_fwd(h, w, ids, vocab_limit, chunk, stream_dh):
    if stream_dh:
        lse, picked, ps_w, w_rows = _lse_gather_fwd_streamed(
            h, w, ids, vocab_limit, chunk)
        # 4-tuple residual = streamed (vs the plain 4... disambiguated by
        # the leading 0-size dtype carrier)
        return (lse, picked), (jnp.zeros((0,), h.dtype), w, ps_w, w_rows)
    lse, picked = _lse_gather_fwd_impl(h, w, ids, vocab_limit, chunk)
    return (lse, picked), (h, w, ids, lse)


def _lse_gather_bwd(vocab_limit, chunk, stream_dh, res, g):
    if stream_dh:
        dtype_ref, w, ps_w, w_rows = res
        g_lse, g_picked = g
        dh = g_lse[:, None] * ps_w + g_picked[:, None] * w_rows
        # frozen-head contract: the exact dw is the zero stop_gradient
        # would produce; int8 dicts take None like the two-pass path
        dw = None if isinstance(w, dict) else jnp.zeros_like(w)
        return dh.astype(dtype_ref.dtype), dw, None
    h, w, ids, lse = res
    g_lse, g_picked = g  # [N], [N]
    n, d = h.shape
    quant = isinstance(w, dict)
    logit_fn, xs, nc = _prep_head_stream(h, w, vocab_limit, chunk)

    def step(dh, w_chunk_and_idx):
        w_chunk, c_idx = w_chunk_and_idx
        s = logit_fn(w_chunk)
        valid = _valid_cols(c_idx, chunk, vocab_limit, n)
        p = jnp.where(valid, jnp.exp(s - lse[:, None]), 0.0)  # softmax chunk
        local = ids - c_idx * chunk
        in_chunk = (local >= 0) & (local < chunk)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (n, chunk), 1)
                  == jnp.clip(local, 0, chunk - 1)[:, None]) & in_chunk[:, None]
        ds = g_lse[:, None] * p + g_picked[:, None] * onehot  # [N, C] fp32
        if quant:
            # dequantize the chunk for the dh matmul; no dw for int8 heads
            # (they are frozen reference/teacher weights by construction)
            wf = (w_chunk["w"].astype(jnp.bfloat16)
                  * w_chunk["s"].astype(jnp.bfloat16)[:, None])
            dh = dh + jax.lax.dot(ds.astype(jnp.bfloat16), wf,
                                  preferred_element_type=jnp.float32)
            return dh, jnp.zeros((), jnp.float32)
        dh = dh + jax.lax.dot(ds.astype(w_chunk["w"].dtype), w_chunk["w"],
                              preferred_element_type=jnp.float32)
        dw_chunk = jax.lax.dot_general(
            ds.astype(h.dtype), h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [C, D]
        return dh, dw_chunk

    dh, dw_chunks = jax.lax.scan(step, jnp.zeros((n, d), jnp.float32),
                                 (xs, jnp.arange(nc)))
    if quant:
        return dh.astype(h.dtype), None, None
    dw = dw_chunks.reshape(nc * chunk, d)[:vocab_limit]
    pad_rows = w.shape[0] - vocab_limit
    if pad_rows > 0:
        dw = jnp.concatenate([dw, jnp.zeros((pad_rows, d), dw.dtype)], axis=0)
    return dh.astype(h.dtype), dw.astype(w.dtype), None


chunked_lse_and_gather.defvjp(_lse_gather_fwd, _lse_gather_bwd)


# ---------------------------------------------------------------------------
# chunked KD cross-entropy  (teacher -> student forward KL numerator)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def chunked_kd_cross_entropy(h_s, w_s, h_t, w_t, weight, vocab_limit: int,
                             chunk: int = DEFAULT_CHUNK,
                             int8_dh: bool = False,
                             stream_dh: bool = False):
    """Per-token  -sum_v p_t(v) * logp_s(v)  weighted-summed over tokens.

    h_s [N, Ds], w_s [Vs, Ds]; h_t [N, Dt], w_t [Vt, Dt]; weight [N] fp32
    (typically mask/sum(mask)).  Teacher side carries no gradient; student
    gradient is weight * (softmax(s) - softmax(t)) @ w_s, computed chunk-wise.
    Returns a scalar.
    """
    loss, _, _ = _kd_fwd_impl(h_s, w_s, h_t, w_t, weight, vocab_limit, chunk)
    return loss


def _kd_stats(h_s, w_s, h_t, w_t, vocab_limit, chunk):
    """Streaming pass: lse_s, lse_t [N], and A = sum_v exp(t_v - m_t) * s_v."""
    n = h_s.shape[0]
    s_fn, s_xs, nc = _prep_head_stream(h_s, w_s, vocab_limit, chunk)
    t_fn, t_xs, _ = _prep_head_stream(h_t, w_t, vocab_limit, chunk)

    def step(carry, inputs):
        m_s, l_s, m_t, l_t, a = carry
        s_c, t_c, c_idx = inputs
        s = s_fn(s_c)
        t = t_fn(t_c)
        valid = _valid_cols(c_idx, chunk, vocab_limit, n)
        s = jnp.where(valid, s, -jnp.inf)
        t = jnp.where(valid, t, -jnp.inf)

        m_s_new = jnp.maximum(m_s, jnp.max(s, axis=1))
        l_s = l_s * jnp.exp(m_s - m_s_new) + jnp.sum(jnp.exp(s - m_s_new[:, None]), axis=1)

        m_t_new = jnp.maximum(m_t, jnp.max(t, axis=1))
        rescale = jnp.exp(m_t - m_t_new)
        et = jnp.where(valid, jnp.exp(t - m_t_new[:, None]), 0.0)
        l_t = l_t * rescale + jnp.sum(et, axis=1)
        a = a * rescale + jnp.sum(et * jnp.where(valid, s, 0.0), axis=1)
        return (m_s_new, l_s, m_t_new, l_t, a), None

    init = (jnp.full((n,), -jnp.inf, jnp.float32), jnp.zeros((n,), jnp.float32),
            jnp.full((n,), -jnp.inf, jnp.float32), jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    (m_s, l_s, m_t, l_t, a), _ = jax.lax.scan(
        step, init, (s_xs, t_xs, jnp.arange(nc)))
    lse_s = m_s + jnp.log(l_s)
    lse_t = m_t + jnp.log(l_t)
    # E_t[s] = A / l_t ;   loss_tok = lse_s - E_t[s]
    e_t_s = a / l_t
    return lse_s, lse_t, e_t_s


def _kd_fwd_impl(h_s, w_s, h_t, w_t, weight, vocab_limit, chunk):
    lse_s, lse_t, e_t_s = _kd_stats(h_s, w_s, h_t, w_t, vocab_limit, chunk)
    per_token = lse_s - e_t_s  # = -sum_v p_t (s_v - lse_s)
    loss = jnp.sum(per_token * weight)
    return loss, lse_s, lse_t



def _acc_matmul(e, s_c, int8_dh):
    """Fold exp-weights [N, C] (f32) with one head chunk into an [N, Ds]
    f32 accumulator contribution (the streamed-dh building block).

    Plain [C, D] chunk: one matmul in the head's dtype (the same numerics
    as the two-pass backward's ds @ W).  int8 dict chunk, exact path:
    dequantize to bf16 (== the two-pass ds @ W_deq).  int8_dh:
    per-vocab-row scales folded into the weights, rows dynamically
    quantized, int8 MXU (STE estimate)."""
    if "s" not in s_c:
        return jax.lax.dot(e.astype(s_c["w"].dtype), s_c["w"],
                           preferred_element_type=jnp.float32)
    if int8_dh:
        ef = e * s_c["s"].astype(jnp.float32)[None, :]
        q, qs = _rowquant(ef)
        y = jax.lax.dot_general(q, s_c["w"], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * qs[:, None]
    wf = (s_c["w"].astype(jnp.bfloat16)
          * s_c["s"].astype(jnp.bfloat16)[:, None])
    return jax.lax.dot(e.astype(jnp.bfloat16), wf,
                       preferred_element_type=jnp.float32)


def _gather_head_rows(w_s, ids):
    """Dequantized [N, Ds] f32 rows of an int8 head dict at `ids`."""
    wq = jnp.take(w_s["w_int8"], ids, axis=0)
    sc = jnp.take(w_s["scale"], ids).astype(jnp.float32)
    return wq.astype(jnp.float32) * sc[:, None]


def _kd_fwd_streamed(h_s, w_s, h_t, w_t, weight, vocab_limit, chunk,
                     int8_dh):
    """KD forward that ALSO streams the dh accumulators (int8 student head
    only, where dw is skipped by contract): the backward then needs NO
    second pass over either head.  dh = coef * (p_s @ W - p_t @ W), and
    both probability-weighted head averages are accumulated chunk-wise in
    the same scan that builds the softmax statistics (flash-attention-style
    running-max rescaling applies to the [N, Ds] accumulators too)."""
    n, d_s = h_s.shape
    s_fn, s_xs, nc = _prep_head_stream(h_s, w_s, vocab_limit, chunk)
    t_fn, t_xs, _ = _prep_head_stream(h_t, w_t, vocab_limit, chunk)

    def step(carry, inputs):
        m_s, l_s, m_t, l_t, a, acc_s, acc_t = carry
        s_c, t_c, c_idx = inputs
        s = s_fn(s_c)
        t = t_fn(t_c)
        valid = _valid_cols(c_idx, chunk, vocab_limit, n)
        s = jnp.where(valid, s, -jnp.inf)
        t = jnp.where(valid, t, -jnp.inf)

        m_s_new = jnp.maximum(m_s, jnp.max(s, axis=1))
        res_s = jnp.exp(m_s - m_s_new)
        es = jnp.exp(s - m_s_new[:, None])          # 0 on invalid cols
        l_s = l_s * res_s + jnp.sum(es, axis=1)

        m_t_new = jnp.maximum(m_t, jnp.max(t, axis=1))
        res_t = jnp.exp(m_t - m_t_new)
        et = jnp.where(valid, jnp.exp(t - m_t_new[:, None]), 0.0)
        l_t = l_t * res_t + jnp.sum(et, axis=1)
        a = a * res_t + jnp.sum(et * jnp.where(valid, s, 0.0), axis=1)

        acc_s = acc_s * res_s[:, None] + _acc_matmul(es, s_c, int8_dh)
        acc_t = acc_t * res_t[:, None] + _acc_matmul(et, s_c, int8_dh)
        return (m_s_new, l_s, m_t_new, l_t, a, acc_s, acc_t), None

    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n, d_s), jnp.float32),
            jnp.zeros((n, d_s), jnp.float32))
    (m_s, l_s, m_t, l_t, a, acc_s, acc_t), _ = jax.lax.scan(
        step, init, (s_xs, t_xs, jnp.arange(nc)))
    lse_s = m_s + jnp.log(l_s)
    loss = jnp.sum((lse_s - a / l_t) * weight)
    ps_w = acc_s / l_s[:, None]
    pt_w = acc_t / l_t[:, None]
    return loss, ps_w, pt_w


def _kd_fwd(h_s, w_s, h_t, w_t, weight, vocab_limit, chunk, int8_dh,
            stream_dh):
    if stream_dh and isinstance(w_s, dict):
        loss, ps_w, pt_w = _kd_fwd_streamed(
            h_s, w_s, h_t, w_t, weight, vocab_limit, chunk, int8_dh)
        if int8_dh:  # STE-grade accumulators: bf16 residual storage
            ps_w, pt_w = ps_w.astype(jnp.bfloat16), pt_w.astype(jnp.bfloat16)
        # 4-tuple residual = streamed branch (vs the plain 7-tuple);
        # the empty array only carries h_s's dtype for the dh cast
        return loss, (jnp.zeros((0,), h_s.dtype), weight, ps_w, pt_w)
    loss, lse_s, lse_t = _kd_fwd_impl(h_s, w_s, h_t, w_t, weight, vocab_limit, chunk)
    return loss, (h_s, w_s, h_t, w_t, weight, lse_s, lse_t)


def _student_dh_and_dw(ds, s_c, h_s, s_quant, int8_dh=False):
    """Fold one chunk's logit cotangent into (dh contribution, dw chunk).

    Plain student head: dh += ds @ w_chunk, dw_chunk = ds^T @ h.  int8
    student head (frozen by contract — the align recipe trains FFN+router
    only): dh uses the dequantized chunk, which makes the gradient EXACT
    w.r.t. the quantized forward; dw is skipped entirely.  int8_dh=True
    (opt-in, TrainConfig.kd_int8_dh) instead folds the per-vocab-row
    scales into the cotangent, dynamically row-quantizes it, and runs dh
    on the int8 MXU — the SAME straight-through cotangent estimate the
    int8 body matmuls use (decoder.dense_int8 backward); direction pinned
    in tests, not bit-exact."""
    if s_quant:
        if int8_dh:
            dsf = ds * s_c["s"].astype(jnp.float32)[None, :]
            q, qs = _rowquant(dsf)
            y = jax.lax.dot_general(q, s_c["w"], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * qs[:, None], \
                jnp.zeros((), jnp.float32)
        wf = (s_c["w"].astype(jnp.bfloat16)
              * s_c["s"].astype(jnp.bfloat16)[:, None])
        dh_c = jax.lax.dot(ds.astype(jnp.bfloat16), wf,
                           preferred_element_type=jnp.float32)
        return dh_c, jnp.zeros((), jnp.float32)
    dh_c = jax.lax.dot(ds.astype(s_c["w"].dtype), s_c["w"],
                       preferred_element_type=jnp.float32)
    dw_c = jax.lax.dot_general(ds.astype(h_s.dtype), h_s,
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return dh_c, dw_c


def _assemble_dw(dw_chunks, w_s, vocab_limit, chunk, nc, s_quant):
    if s_quant:
        return None
    dw = dw_chunks.reshape(nc * chunk, -1)[:vocab_limit]
    pad_rows = w_s.shape[0] - vocab_limit
    if pad_rows > 0:
        dw = jnp.concatenate(
            [dw, jnp.zeros((pad_rows, dw.shape[1]), dw.dtype)], 0)
    return dw.astype(w_s.dtype)


def _kd_bwd(vocab_limit, chunk, int8_dh, stream_dh, res, g):
    if len(res) == 4:
        # streamed branch (int8 student head): the forward already holds
        # p_s @ W and p_t @ W — dh is elementwise, NO head repass, no dw
        dtype_ref, weight, ps_w, pt_w = res
        coef = (g * weight)[:, None]
        dh = coef * (ps_w.astype(jnp.float32) - pt_w.astype(jnp.float32))
        return (dh.astype(dtype_ref.dtype), None, None, None,
                jnp.zeros_like(weight))
    h_s, w_s, h_t, w_t, weight, lse_s, lse_t = res
    n, d_s = h_s.shape
    s_quant = isinstance(w_s, dict)
    s_fn, s_xs, nc = _prep_head_stream(h_s, w_s, vocab_limit, chunk)
    t_fn, t_xs, _ = _prep_head_stream(h_t, w_t, vocab_limit, chunk)
    coef = (g * weight)[:, None]  # [N, 1]

    def step(dh, inputs):
        s_c, t_c, c_idx = inputs
        s = s_fn(s_c)
        t = t_fn(t_c)
        valid = _valid_cols(c_idx, chunk, vocab_limit, n)
        p_s = jnp.where(valid, jnp.exp(s - lse_s[:, None]), 0.0)
        p_t = jnp.where(valid, jnp.exp(t - lse_t[:, None]), 0.0)
        ds = coef * (p_s - p_t)  # d loss / d s_chunk
        dh_c, dw_c = _student_dh_and_dw(ds, s_c, h_s, s_quant, int8_dh)
        return dh + dh_c, dw_c

    dh, dw_chunks = jax.lax.scan(step, jnp.zeros((n, d_s), jnp.float32),
                                 (s_xs, t_xs, jnp.arange(nc)))
    dw = _assemble_dw(dw_chunks, w_s, vocab_limit, chunk, nc, s_quant)
    return (dh.astype(h_s.dtype), dw, None, None, jnp.zeros_like(weight))


chunked_kd_cross_entropy.defvjp(_kd_fwd, _kd_bwd)


# ---------------------------------------------------------------------------
# fused KD + CE  (the kd_lm recipe of record: one pass over student logits)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def chunked_kd_ce(h_s, w_s, h_t, w_t, kd_weight, ce_weight, ce_ids,
                  vocab_limit: int, chunk: int = DEFAULT_CHUNK,
                  int8_dh: bool = False, stream_dh: bool = False):
    """Fused  (KD loss, CE loss)  sharing ONE streaming pass.

    The kd_lm objective (align_trainer.py:570-573) needs both the
    teacher-KL and the student CE; computed separately they stream the
    student logits twice.  Here one scan produces the shared student
    logsumexp, the teacher statistics, AND the CE label logits; the fused
    backward likewise folds both cotangents into one ds per chunk:
        ds = g_kd*kd_w*(p_s - p_t) + g_ce*ce_w*(p_s - onehot(ce_ids)).
    ce_ids must be < vocab_limit (mask + clamp upstream).  Returns
    (kd_loss, ce_loss) scalars.
    """
    kd, ce, *_ = _kdce_fwd_impl(h_s, w_s, h_t, w_t, kd_weight, ce_weight,
                                ce_ids, vocab_limit, chunk)
    return kd, ce


def _kdce_fwd_impl(h_s, w_s, h_t, w_t, kd_weight, ce_weight, ce_ids,
                   vocab_limit, chunk):
    n = h_s.shape[0]
    s_fn, s_xs, nc = _prep_head_stream(h_s, w_s, vocab_limit, chunk)
    t_fn, t_xs, _ = _prep_head_stream(h_t, w_t, vocab_limit, chunk)

    def step(carry, inputs):
        m_s, l_s, m_t, l_t, a, picked = carry
        s_c, t_c, c_idx = inputs
        s = s_fn(s_c)
        t = t_fn(t_c)
        valid = _valid_cols(c_idx, chunk, vocab_limit, n)
        s = jnp.where(valid, s, -jnp.inf)
        t = jnp.where(valid, t, -jnp.inf)

        m_s_new = jnp.maximum(m_s, jnp.max(s, axis=1))
        l_s = l_s * jnp.exp(m_s - m_s_new) + jnp.sum(
            jnp.exp(s - m_s_new[:, None]), axis=1)

        m_t_new = jnp.maximum(m_t, jnp.max(t, axis=1))
        rescale = jnp.exp(m_t - m_t_new)
        et = jnp.where(valid, jnp.exp(t - m_t_new[:, None]), 0.0)
        l_t = l_t * rescale + jnp.sum(et, axis=1)
        a = a * rescale + jnp.sum(et * jnp.where(valid, s, 0.0), axis=1)

        local = ce_ids - c_idx * chunk
        in_chunk = (local >= 0) & (local < chunk)
        got = jnp.take_along_axis(
            s, jnp.clip(local, 0, chunk - 1)[:, None], axis=1)[:, 0]
        picked = jnp.where(in_chunk, got, picked)
        return (m_s_new, l_s, m_t_new, l_t, a, picked), None

    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    (m_s, l_s, m_t, l_t, a, picked), _ = jax.lax.scan(
        step, init, (s_xs, t_xs, jnp.arange(nc)))
    lse_s = m_s + jnp.log(l_s)
    lse_t = m_t + jnp.log(l_t)
    kd = jnp.sum((lse_s - a / l_t) * kd_weight)
    ce = jnp.sum((lse_s - picked) * ce_weight)
    return kd, ce, lse_s, lse_t



def _kdce_fwd_streamed(h_s, w_s, h_t, w_t, kd_weight, ce_weight, ce_ids,
                       vocab_limit, chunk, int8_dh):
    """kd_lm forward with streamed dh accumulators (int8 student head):
    ds = g_kd*kd_w*(p_s - p_t) + g_ce*ce_w*(p_s - onehot(ce_ids)), so
    dh = coef_kd*(p_s@W - p_t@W) + coef_ce*(p_s@W - W[ce_ids]) — all three
    terms come out of the SAME stats scan; the backward never touches the
    heads again."""
    n, d_s = h_s.shape
    s_fn, s_xs, nc = _prep_head_stream(h_s, w_s, vocab_limit, chunk)
    t_fn, t_xs, _ = _prep_head_stream(h_t, w_t, vocab_limit, chunk)

    def step(carry, inputs):
        m_s, l_s, m_t, l_t, a, picked, acc_s, acc_t = carry
        s_c, t_c, c_idx = inputs
        s = s_fn(s_c)
        t = t_fn(t_c)
        valid = _valid_cols(c_idx, chunk, vocab_limit, n)
        s = jnp.where(valid, s, -jnp.inf)
        t = jnp.where(valid, t, -jnp.inf)

        m_s_new = jnp.maximum(m_s, jnp.max(s, axis=1))
        res_s = jnp.exp(m_s - m_s_new)
        es = jnp.exp(s - m_s_new[:, None])
        l_s = l_s * res_s + jnp.sum(es, axis=1)

        m_t_new = jnp.maximum(m_t, jnp.max(t, axis=1))
        res_t = jnp.exp(m_t - m_t_new)
        et = jnp.where(valid, jnp.exp(t - m_t_new[:, None]), 0.0)
        l_t = l_t * res_t + jnp.sum(et, axis=1)
        a = a * res_t + jnp.sum(et * jnp.where(valid, s, 0.0), axis=1)

        local = ce_ids - c_idx * chunk
        in_chunk = (local >= 0) & (local < chunk)
        got = jnp.take_along_axis(
            s, jnp.clip(local, 0, chunk - 1)[:, None], axis=1)[:, 0]
        picked = jnp.where(in_chunk, got, picked)

        acc_s = acc_s * res_s[:, None] + _acc_matmul(es, s_c, int8_dh)
        acc_t = acc_t * res_t[:, None] + _acc_matmul(et, s_c, int8_dh)
        return (m_s_new, l_s, m_t_new, l_t, a, picked, acc_s, acc_t), None

    init = (jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.full((n,), -jnp.inf, jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n, d_s), jnp.float32),
            jnp.zeros((n, d_s), jnp.float32))
    (m_s, l_s, m_t, l_t, a, picked, acc_s, acc_t), _ = jax.lax.scan(
        step, init, (s_xs, t_xs, jnp.arange(nc)))
    lse_s = m_s + jnp.log(l_s)
    lse_t = m_t + jnp.log(l_t)
    kd = jnp.sum((lse_s - a / l_t) * kd_weight)
    ce = jnp.sum((lse_s - picked) * ce_weight)
    ps_w = acc_s / l_s[:, None]
    pt_w = acc_t / l_t[:, None]
    return kd, ce, ps_w, pt_w


def _kdce_fwd(h_s, w_s, h_t, w_t, kd_weight, ce_weight, ce_ids,
              vocab_limit, chunk, int8_dh, stream_dh):
    if stream_dh and isinstance(w_s, dict):
        kd, ce, ps_w, pt_w = _kdce_fwd_streamed(
            h_s, w_s, h_t, w_t, kd_weight, ce_weight, ce_ids, vocab_limit,
            chunk, int8_dh)
        if int8_dh:
            # the accumulators are already STE-grade (int8 matmuls with
            # quantized rows): bf16 residual storage halves the stacked
            # per-microbatch footprint without changing the estimate class
            ps_w, pt_w = ps_w.astype(jnp.bfloat16), pt_w.astype(jnp.bfloat16)
        # 6-tuple residual = streamed branch (vs the plain 9-tuple)
        return (kd, ce), (jnp.zeros((0,), h_s.dtype), w_s, kd_weight,
                          ce_weight, ce_ids, (ps_w, pt_w))
    kd, ce, lse_s, lse_t = _kdce_fwd_impl(
        h_s, w_s, h_t, w_t, kd_weight, ce_weight, ce_ids, vocab_limit, chunk)
    return (kd, ce), (h_s, w_s, h_t, w_t, kd_weight, ce_weight, ce_ids,
                      lse_s, lse_t)


def _kdce_bwd(vocab_limit, chunk, int8_dh, stream_dh, res, g):
    if len(res) == 6:
        # streamed branch (int8 student head): dh is elementwise over the
        # forward's p_s@W / p_t@W accumulators + one dequantized row gather
        dtype_ref, w_s, kd_weight, ce_weight, ce_ids, (ps_w, pt_w) = res
        ps_w = ps_w.astype(jnp.float32)
        pt_w = pt_w.astype(jnp.float32)
        g_kd, g_ce = g
        coef_kd = (g_kd * kd_weight)[:, None]
        coef_ce = (g_ce * ce_weight)[:, None]
        w_ce = _gather_head_rows(w_s, ce_ids)
        dh = coef_kd * (ps_w - pt_w) + coef_ce * (ps_w - w_ce)
        return (dh.astype(dtype_ref.dtype), None, None, None,
                jnp.zeros_like(kd_weight), jnp.zeros_like(ce_weight), None)
    h_s, w_s, h_t, w_t, kd_weight, ce_weight, ce_ids, lse_s, lse_t = res
    g_kd, g_ce = g
    n, d_s = h_s.shape
    s_quant = isinstance(w_s, dict)
    s_fn, s_xs, nc = _prep_head_stream(h_s, w_s, vocab_limit, chunk)
    t_fn, t_xs, _ = _prep_head_stream(h_t, w_t, vocab_limit, chunk)
    coef_kd = (g_kd * kd_weight)[:, None]
    coef_ce = (g_ce * ce_weight)[:, None]

    def step(dh, inputs):
        s_c, t_c, c_idx = inputs
        s = s_fn(s_c)
        t = t_fn(t_c)
        valid = _valid_cols(c_idx, chunk, vocab_limit, n)
        p_s = jnp.where(valid, jnp.exp(s - lse_s[:, None]), 0.0)
        p_t = jnp.where(valid, jnp.exp(t - lse_t[:, None]), 0.0)
        local = ce_ids - c_idx * chunk
        in_chunk = (local >= 0) & (local < chunk)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (n, chunk), 1)
                  == jnp.clip(local, 0, chunk - 1)[:, None]) & in_chunk[:, None]
        ds = coef_kd * (p_s - p_t) + coef_ce * (p_s - onehot)
        dh_c, dw_c = _student_dh_and_dw(ds, s_c, h_s, s_quant, int8_dh)
        return dh + dh_c, dw_c

    dh, dw_chunks = jax.lax.scan(step, jnp.zeros((n, d_s), jnp.float32),
                                 (s_xs, t_xs, jnp.arange(nc)))
    dw = _assemble_dw(dw_chunks, w_s, vocab_limit, chunk, nc, s_quant)
    return (dh.astype(h_s.dtype), dw, None, None,
            jnp.zeros_like(kd_weight), jnp.zeros_like(ce_weight), None)


chunked_kd_ce.defvjp(_kdce_fwd, _kdce_bwd)


# ---------------------------------------------------------------------------
# High-level losses
# ---------------------------------------------------------------------------

class TokenLossOutput(NamedTuple):
    loss: jnp.ndarray           # scalar
    num_tokens: jnp.ndarray     # scalar fp32


def softmax_cross_entropy(hidden, w_head, labels, ignore_index: int = -100,
                          vocab_limit: Optional[int] = None,
                          chunk: int = DEFAULT_CHUNK,
                          shift: bool = True,
                          stream_dh: bool = False) -> TokenLossOutput:
    """Causal-LM CE.  hidden [B,T,D], w_head [V,D], labels [B,T].

    shift=True applies the standard next-token shift (HF CausalLM semantics);
    the loss is the token-mean over labels != ignore_index.
    """
    if shift:
        hidden = hidden[:, :-1]
        labels = labels[:, 1:]
    b, t, d = hidden.shape
    v = _head_rows(w_head) if vocab_limit is None else vocab_limit
    h = hidden.reshape(b * t, d)
    ids = labels.reshape(b * t)
    mask = (ids != ignore_index)
    safe_ids = jnp.where(mask, ids, 0).astype(jnp.int32)
    lse, picked = chunked_lse_and_gather(h, w_head, safe_ids, v, chunk,
                                         stream_dh)
    per_tok = (lse - picked) * mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return TokenLossOutput(jnp.sum(per_tok) / denom, denom)


def kd_align_loss(hidden_s, w_head_s, hidden_t, w_head_t, labels,
                  ignore_index: int = -100, vocab_limit: Optional[int] = None,
                  distill_all_tokens: bool = False,
                  chunk: int = DEFAULT_CHUNK,
                  int8_dh: bool = False,
                  stream_dh: bool = False) -> TokenLossOutput:
    """Mimic-distillation loss (reference compute_align_loss semantics):
    token-mean over the response mask of -sum_v p_t(v) logp_s(v), with NO
    next-token shift (teacher and student are aligned position-wise)."""
    b, t, d_s = hidden_s.shape
    v = (min(_head_rows(w_head_s), _head_rows(w_head_t))
         if vocab_limit is None else vocab_limit)
    h_s = hidden_s.reshape(b * t, d_s)
    h_t = hidden_t.reshape(b * t, hidden_t.shape[-1])
    if distill_all_tokens:
        mask = jnp.ones((b * t,), jnp.float32)
    else:
        mask = (labels.reshape(b * t) != ignore_index).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    weight = mask / denom
    h_t = jax.lax.stop_gradient(h_t)
    w_head_t = jax.lax.stop_gradient(w_head_t)
    loss = chunked_kd_cross_entropy(h_s, w_head_s, h_t, w_head_t, weight,
                                    v, chunk, int8_dh, stream_dh)
    return TokenLossOutput(loss, denom)


class KdCeOutput(NamedTuple):
    kd_loss: jnp.ndarray
    ce_loss: jnp.ndarray
    kd_tokens: jnp.ndarray
    ce_tokens: jnp.ndarray


def kd_ce_align_loss(hidden_s, w_head_s, hidden_t, w_head_t, labels,
                     ignore_index: int = -100,
                     vocab_limit: Optional[int] = None,
                     distill_all_tokens: bool = False,
                     chunk: int = DEFAULT_CHUNK,
                     int8_dh: bool = False,
                     stream_dh: bool = False) -> KdCeOutput:
    """kd_lm objective in one streaming pass (align_trainer.py:570-573):
    KD is same-position over the response mask; CE is next-token-shifted —
    both share the same [B*T] student logit stream (the last position's CE
    target is masked, matching the shift)."""
    b, t, d_s = hidden_s.shape
    v = (min(_head_rows(w_head_s), _head_rows(w_head_t))
         if vocab_limit is None else vocab_limit)
    h_s = hidden_s.reshape(b * t, d_s)
    h_t = jax.lax.stop_gradient(hidden_t.reshape(b * t, hidden_t.shape[-1]))
    w_head_t = jax.lax.stop_gradient(w_head_t)

    flat = labels.reshape(b * t)
    if distill_all_tokens:
        kd_mask = jnp.ones((b * t,), jnp.float32)
    else:
        kd_mask = (flat != ignore_index).astype(jnp.float32)
    kd_denom = jnp.maximum(jnp.sum(kd_mask), 1.0)

    # CE: row i predicts labels[i+1]; the last row of each sequence is masked
    shifted = jnp.concatenate(
        [labels[:, 1:], jnp.full((b, 1), ignore_index, labels.dtype)], axis=1)
    ce_ids_full = shifted.reshape(b * t)
    ce_mask = (ce_ids_full != ignore_index) & (ce_ids_full < v)
    ce_mask = ce_mask.astype(jnp.float32)
    ce_denom = jnp.maximum(jnp.sum(ce_mask), 1.0)
    ce_ids = jnp.where(ce_mask > 0, ce_ids_full, 0).astype(jnp.int32)

    kd, ce = chunked_kd_ce(h_s, w_head_s, h_t, w_head_t,
                           kd_mask / kd_denom, ce_mask / ce_denom, ce_ids,
                           v, chunk, int8_dh, stream_dh)
    return KdCeOutput(kd, ce, kd_denom, ce_denom)


def sequence_log_prob(hidden, w_head, labels, ignore_index: int = -100,
                      vocab_limit: Optional[int] = None,
                      average: bool = False,
                      chunk: int = DEFAULT_CHUNK,
                      stream_dh: bool = False) -> jnp.ndarray:
    """Per-sequence sum (or mean) of response-token log-probs.

    Matches DPOTrainer.get_logp (dpo_trainer.py:462-495): labels shifted by
    one against logits, mask = shifted labels != ignore_index.
    Returns [B] fp32.
    """
    hidden = hidden[:, :-1]
    labels = labels[:, 1:]
    b, t, d = hidden.shape
    v = _head_rows(w_head) if vocab_limit is None else vocab_limit
    h = hidden.reshape(b * t, d)
    ids = labels.reshape(b * t)
    mask = (ids != ignore_index)
    safe_ids = jnp.where(mask, ids, 0).astype(jnp.int32)
    lse, picked = chunked_lse_and_gather(h, w_head, safe_ids, v, chunk,
                                         stream_dh)
    per_tok = (picked - lse) * mask.astype(jnp.float32)
    per_seq = per_tok.reshape(b, t).sum(axis=1)
    if average:
        denom = jnp.maximum(mask.astype(jnp.float32).reshape(b, t).sum(axis=1), 1.0)
        per_seq = per_seq / denom
    return per_seq


class DPOOutput(NamedTuple):
    losses: jnp.ndarray          # [B] (or [2B] for kto_pair)
    chosen_rewards: jnp.ndarray  # [B]
    rejected_rewards: jnp.ndarray


def dpo_loss(policy_chosen_logps, policy_rejected_logps,
             reference_chosen_logps, reference_rejected_logps,
             *, beta: float = 0.1, label_smoothing: float = 0.0,
             loss_type: str = "sigmoid",
             reference_free: bool = False) -> DPOOutput:
    """Preference losses: sigmoid | hinge | ipo | kto_pair
    (parity with reference dpo_trainer.py:497-562)."""
    pi_logratios = policy_chosen_logps - policy_rejected_logps
    ref_logratios = 0.0 if reference_free else (
        reference_chosen_logps - reference_rejected_logps)
    logits = pi_logratios - ref_logratios

    if loss_type == "sigmoid":
        losses = (
            -jax.nn.log_sigmoid(beta * logits) * (1 - label_smoothing)
            - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
        )
    elif loss_type == "hinge":
        losses = jax.nn.relu(1 - beta * logits)
    elif loss_type == "ipo":
        losses = (logits - 1 / (2 * beta)) ** 2
    elif loss_type == "kto_pair":
        chosen_kl = jnp.clip(
            jnp.mean(policy_chosen_logps - reference_chosen_logps), min=0)
        rejected_kl = jnp.clip(
            jnp.mean(policy_rejected_logps - reference_rejected_logps), min=0)
        chosen_logratios = policy_chosen_logps - reference_chosen_logps
        rejected_logratios = policy_rejected_logps - reference_rejected_logps
        losses = jnp.concatenate([
            1 - jax.nn.sigmoid(beta * (chosen_logratios - rejected_kl)),
            1 - jax.nn.sigmoid(beta * (chosen_kl - rejected_logratios)),
        ], axis=0)
    else:
        raise ValueError(f"Unknown DPO loss type: {loss_type}")

    chosen_rewards = beta * jax.lax.stop_gradient(
        policy_chosen_logps - reference_chosen_logps)
    rejected_rewards = beta * jax.lax.stop_gradient(
        policy_rejected_logps - reference_rejected_logps)
    return DPOOutput(losses, chosen_rewards, rejected_rewards)
