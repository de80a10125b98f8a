"""Jitted training steps for the three pipeline stages.

One pjit program per stage (SURVEY.md §7): teacher and student are two param
trees in the SAME jitted step — no separate "ref-model engine" like the
reference's DeepSpeed wrapping (align_trainer.py:436-453).

  * pretrain_step — stage-1 adaptor init: CE on caption tokens, projector-only
    updates (train/train.py flow, SURVEY.md §3.1).
  * align_step    — mimic distillation: teacher forward (stop-grad) + student
    forward + vocab-chunked KD loss (+ CE if kd_lm) + router aux loss
    (align_trainer.py:530-589 semantics).
  * dpo_step      — preference distillation: policy and reference each run
    chosen+rejected as ONE batched forward (batch concat), then
    sigmoid/hinge/ipo/kto_pair loss (dpo_trainer.py:564-641) — 2 forwards
    per step instead of the reference's 4.

Mixed precision: params live in fp32, forwards run in `compute_dtype`
(bf16 on TPU) via a cast at the loss-fn boundary; losses/grads accumulate
fp32.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llavamod_tpu.models import llava
from llavamod_tpu.models.llava import LlavaConfig, MultimodalBatch
from llavamod_tpu.ops.losses import (
    dpo_loss,
    kd_align_loss,
    kd_ce_align_loss,
    sequence_log_prob,
    softmax_cross_entropy,
)
from llavamod_tpu.train.config import TrainConfig
from llavamod_tpu.train.optim import TrainState, build_optimizer

Metrics = Dict[str, jnp.ndarray]

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "float16": jnp.float16}


def _cast_tree(tree, dtype):
    def cast(path, x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            # int8-quantization scales stay fp32 (per-channel dequant
            # fidelity; they multiply int32 accumulators, not the MXU path)
            if any(getattr(p, "key", None) == "scale" for p in path):
                return x
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map_with_path(cast, tree)


def batch_from_arrays(d: Dict[str, Any], prefix: str = "") -> MultimodalBatch:
    """Build a MultimodalBatch from a collator dict (prefix for DPO sides)."""
    g = lambda k: jnp.asarray(d[prefix + k])  # noqa: E731
    return MultimodalBatch(
        input_ids=g("input_ids"),
        segment_ids=g("segment_ids"),
        image_mask=g("image_mask"),
        image_pos=g("image_pos"),
        pixels=jnp.asarray(d["pixels"]),
        pixel_valid=jnp.asarray(d["pixel_valid"]),
        labels=g("labels"),
        video_pixels=(jnp.asarray(d["video_pixels"])
                      if "video_pixels" in d else None),
        video_valid=(jnp.asarray(d["video_valid"])
                     if "video_valid" in d else None),
    )


def _effective_params(params, lora_cfg):
    """Resolve a trainable tree to model params.

    Plain tree -> itself.  LoRA-split tree {'base','lora'} -> on-the-fly
    merge (models/lora.py); the merge is rank-r and costs O(r/T) of a full
    matmul, so doing it every step keeps the graph functional with no module
    surgery (reference applies PEFT wrappers instead, align_train.py:290-327).
    """
    if isinstance(params, dict) and "lora" in params and "base" in params:
        from llavamod_tpu.models.lora import merge_lora

        assert lora_cfg is not None, "LoRA params need a LoraConfig"
        return merge_lora(params["base"], params["lora"], lora_cfg)
    return params


def _grad_fn(loss_fn):
    """value_and_grad that tolerates int8 leaves in the param tree
    (pre-quantized frozen heads): int leaves get float0 tangents
    (allow_int), which we replace with broadcastable scalar zeros so the
    masked optimizer (set_to_zero for frozen) and apply_updates pass
    through untouched."""
    vg = jax.value_and_grad(loss_fn, has_aux=True, allow_int=True)

    def run(params, *args):
        out, grads = vg(params, *args)
        grads = jax.tree_util.tree_map(
            lambda g: (jnp.zeros((), jnp.float32)
                       if g.dtype == jax.dtypes.float0 else g), grads)
        return out, grads

    return run


def _stop_frozen(params, tcfg: TrainConfig, lora_cfg=None):
    """stop_gradient every frozen param so XLA dead-code-eliminates their
    backward (the optimizer's set_to_zero masking alone still pays for the
    full backward + grad buffers)."""
    from llavamod_tpu.train.optim import trainable_mask

    mask = trainable_mask(params, tcfg, lora_cfg)
    return jax.tree_util.tree_map(
        lambda p, t: p if t else jax.lax.stop_gradient(p), params, mask)


def _student_forward(params, cfg: LlavaConfig, batch: MultimodalBatch,
                     tcfg: TrainConfig, lora_cfg=None, tower_feats=None):
    dtype = _DTYPES[tcfg.compute_dtype]
    cparams = _cast_tree(_effective_params(params, lora_cfg), dtype)
    cbatch = batch._replace(pixels=batch.pixels.astype(dtype))
    out = llava.forward(cparams, cfg, cbatch, train=True, remat=tcfg.remat,
                        attn_impl=tcfg.attn_impl, tower_feats=tower_feats)
    w_head = llava.lm_head_weight(cparams, cfg)
    if tcfg.student_head_quant and not isinstance(w_head, dict):
        # frozen-head recipes only (see TrainConfig.student_head_quant):
        # quantize from the live params each step, grads cut here
        from llavamod_tpu.models.llm.decoder import quantize_head_int8

        w_head = jax.lax.stop_gradient(quantize_head_int8(w_head))
    return out, w_head


def _can_share_tower(tcfg: TrainConfig, a: LlavaConfig, b: LlavaConfig) -> bool:
    return (tcfg.share_vision_tower and a.vision == b.vision
            and a.select_layer == b.select_layer
            and a.select_feature == b.select_feature
            and a.s2_scales == b.s2_scales
            and a.freeze_vision and b.freeze_vision)


def _shared_tower_feats(params, cfg: LlavaConfig, batch: MultimodalBatch,
                        tcfg: TrainConfig):
    """Frozen tower runs once; both models consume the features."""
    dtype = _DTYPES[tcfg.compute_dtype]
    src = params["base"] if (isinstance(params, dict)
                             and "base" in params and "lora" in params) else params
    vis = _cast_tree({"vision": src["vision"]}, dtype)
    pixels = batch.pixels.astype(dtype).reshape(
        (-1,) + batch.pixels.shape[2:])
    return llava.encode_tower(vis, cfg, pixels)


def _moe_metrics(out, cfg: LlavaConfig) -> Metrics:
    m: Metrics = {}
    if cfg.llm.is_moe:
        m["loss/moe_balance"] = out.aux_loss
    return m


# ---------------------------------------------------------------------------
# stage 1 / SFT
# ---------------------------------------------------------------------------

def _stack_row_chunks(batch: MultimodalBatch, n_ck: int,
                      rows_per_sample: int) -> MultimodalBatch:
    """[B, ...] fields -> stacked [n_ck, B/n_ck, ...] chunk batches.

    image_pos indexes the batch-global flat media table (the collator adds
    sample_row * rows_per_sample, data/collator.py) — each chunk's table
    starts rows * rows_per_sample further in, so re-offset per chunk (the
    inverse of train/loader.py::fold_microbatches)."""
    b = batch.input_ids.shape[0]
    rows = b // n_ck

    def r(x):
        return None if x is None else x.reshape((n_ck, rows) + x.shape[1:])

    ipos = r(batch.image_pos)
    off = (jnp.arange(n_ck, dtype=ipos.dtype)
           * rows * rows_per_sample)[:, None, None]
    return batch._replace(
        input_ids=r(batch.input_ids), segment_ids=r(batch.segment_ids),
        image_mask=r(batch.image_mask), image_pos=ipos - off,
        pixels=r(batch.pixels), pixel_valid=r(batch.pixel_valid),
        labels=r(batch.labels), positions=r(batch.positions),
        video_pixels=r(batch.video_pixels), video_valid=r(batch.video_valid))


def _ce_token_counts(stacked_labels: jnp.ndarray,
                     ignore_index: int = -100) -> jnp.ndarray:
    """[n_ck] per-chunk RAW supervised-token counts (next-token shift,
    labels != ignore_index).  Deliberately unfloored: an empty chunk's CE
    is 0 with zero gradient, so its weight must be 0 — flooring at 1 would
    scale every gradient by N/(N+n_empty) vs the one-shot step."""
    mask = (stacked_labels[:, :, 1:] != ignore_index)
    return jnp.sum(mask.astype(jnp.float32), axis=(1, 2))


def _head_weight_frozen(cfg: LlavaConfig, tcfg: TrainConfig,
                        lora_cfg=None) -> bool:
    """True iff the LM-head weight leaf provably receives no updates under
    trainable_mask's rules (mirrors train/optim.py::trainable_mask for the
    head path) — the precondition for the EXACT streamed frozen-head
    backward of chunked_lse_and_gather."""
    if lora_cfg is not None:
        return False  # adapters could target the head; stay conservative
    if tcfg.tune_mm_mlp_adapter:
        return True   # stage-1: projector-only
    path = ("llm/embed/embedding" if cfg.llm.tie_word_embeddings
            else "llm/lm_head/weight")
    if tcfg.train_modules:
        return not any(m in path for m in tcfg.train_modules)
    return False      # full SFT: everything trains


def make_pretrain_step(cfg: LlavaConfig, tcfg: TrainConfig,
                       lora_cfg=None) -> Callable:
    opt = build_optimizer_cached(tcfg, lora_cfg)
    coef = (cfg.llm.router_aux_loss_coef
            if (cfg.llm.is_moe and tcfg.moe_loss_enable) else 0.0)
    # frozen head => the CE backward streams p@W in the forward and
    # never re-runs the head-logit pass (exact; ops/losses.py)
    ce_stream = _head_weight_frozen(cfg, tcfg, lora_cfg)

    def loss_fn(params, batch: MultimodalBatch):
        params = _stop_frozen(params, tcfg, lora_cfg)
        out, w_head = _student_forward(params, cfg, batch, tcfg, lora_cfg)
        ce = softmax_cross_entropy(out.hidden, w_head, batch.labels,
                                   chunk=tcfg.vocab_chunk,
                                   stream_dh=ce_stream)
        loss = ce.loss
        metrics = {"loss/lm": ce.loss, "num_tokens": ce.num_tokens}
        if cfg.llm.is_moe and tcfg.moe_loss_enable:
            moe = cfg.llm.router_aux_loss_coef * out.aux_loss
            loss = loss + moe
            metrics["loss/moe_balance"] = out.aux_loss
        metrics["loss"] = loss
        return loss, metrics

    def chunk_term(params, cb: MultimodalBatch, w_ce, w_aux):
        """Scalar whose per-chunk gradients SUM to the full-batch gradient:
        w_ce * ce_mean_chunk + w_aux * aux_chunk, with w_ce = the chunk's
        CE token share (constant wrt params) and w_aux = coef / n_chunks
        (the folded aux is the mean over equal-row chunks)."""
        params = _stop_frozen(params, tcfg, lora_cfg)
        out, w_head = _student_forward(params, cfg, cb, tcfg, lora_cfg)
        ce = softmax_cross_entropy(out.hidden, w_head, cb.labels,
                                   chunk=tcfg.vocab_chunk,
                                   stream_dh=ce_stream)
        aux = out.aux_loss if cfg.llm.is_moe else jnp.zeros((), jnp.float32)
        return w_ce * ce.loss + w_aux * aux, (ce.loss, aux)

    def chunked_grads(params, batch: MultimodalBatch, n_ck: int):
        rps = cfg.max_images * cfg.num_image_tokens
        if cfg.video_projector_type is not None:
            rps += cfg.num_video_tokens
        stacked = _stack_row_chunks(batch, n_ck, rps)
        ntok = _ce_token_counts(stacked.labels)
        n_total = jnp.maximum(jnp.sum(ntok), 1.0)
        w_ces = ntok / n_total
        w_aux = jnp.asarray(coef / n_ck, jnp.float32)
        run = _grad_fn(chunk_term)

        take = lambda tree, i: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x[i], tree)

        def body(carry, xs):
            g_sum, loss_sum, ce_sum, aux_sum = carry
            cb, w_ce, n_c = xs
            (t_c, (ce_c, aux_c)), g_c = run(params, cb, w_ce, w_aux)
            return (jax.tree_util.tree_map(jnp.add, g_sum, g_c),
                    loss_sum + t_c, ce_sum + ce_c * n_c,
                    aux_sum + aux_c), None

        # seed the carry with zeros shaped via eval_shape so the per-chunk
        # forward+backward (the heaviest region) is traced/compiled ONCE in
        # the scan body instead of twice (unrolled chunk 0 + scan)
        _, g_shapes = jax.eval_shape(run, params, take(stacked, 0),
                                     w_ces[0], w_aux)
        g0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), g_shapes)
        zero = jnp.zeros((), jnp.float32)
        (grads, loss, ce_sum, aux_sum), _ = jax.lax.scan(
            body, (g0, zero, zero, zero), (stacked, w_ces, ntok))
        metrics: Metrics = {"loss/lm": ce_sum / n_total,
                            "num_tokens": n_total, "loss": loss}
        if cfg.llm.is_moe and tcfg.moe_loss_enable:
            metrics["loss/moe_balance"] = aux_sum / n_ck
        return metrics, grads

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def _step(state: TrainState, batch: MultimodalBatch,
              n_ck: int) -> Tuple[TrainState, Metrics]:
        if n_ck > 1:
            metrics, grads = chunked_grads(state.params, batch, n_ck)
        else:
            (_, metrics), grads = _grad_fn(loss_fn)(state.params, batch)
        updates, new_opt = opt(state.params).update(grads, state.opt_state,
                                                    state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, new_opt), metrics

    def step(state: TrainState,
             batch: MultimodalBatch) -> Tuple[TrainState, Metrics]:
        b, t = batch.input_ids.shape
        n_ck = tcfg.grad_row_chunks
        n_ck = n_ck if (n_ck > 1 and b % n_ck == 0) else 1
        if n_ck > 1 and cfg.llm.is_moe:
            # same exactness rule as the fused path: chunked routing ==
            # folded routing only when gating groups tile the chunk
            group = cfg.llm.moe_gating_group_size
            if not (group > 0 and ((b // n_ck) * t) % group == 0):
                n_ck = 1
        return _step(state, batch, n_ck)

    return step


def build_optimizer_cached(tcfg: TrainConfig, lora_cfg=None):
    cache = {}

    def get(params):
        if "opt" not in cache:
            cache["opt"] = build_optimizer(params, tcfg, lora_cfg)
        return cache["opt"]

    return get


# ---------------------------------------------------------------------------
# stage 2: mimic (KD) distillation
# ---------------------------------------------------------------------------

def make_align_step(student_cfg: LlavaConfig, teacher_cfg: LlavaConfig,
                    tcfg: TrainConfig, lora_cfg=None) -> Callable:
    """step(state, teacher_params, batch) -> (state, metrics).

    Loss = KD (+ student CE if kd_lm) + router aux * coef
    (align_trainer.py:570-580)."""
    opt = build_optimizer_cached(tcfg, lora_cfg)
    vocab_limit = tcfg.kd_vocab_limit or min(student_cfg.llm.vocab_size,
                                             teacher_cfg.llm.vocab_size)

    share_tower = _can_share_tower(tcfg, student_cfg, teacher_cfg)

    def teacher_forward(teacher_params, batch, tower_feats):
        dtype = _DTYPES[tcfg.compute_dtype]
        tp = _cast_tree(teacher_params, dtype)
        tb = batch._replace(pixels=batch.pixels.astype(dtype))
        out = llava.forward(tp, teacher_cfg, tb, train=False,
                            attn_impl=tcfg.attn_impl, tower_feats=tower_feats)
        w = llava.lm_head_weight(tp, teacher_cfg)
        return jax.lax.stop_gradient(out.hidden), jax.lax.stop_gradient(w)

    def loss_fn(params, teacher_params, batch: MultimodalBatch):
        params = _stop_frozen(params, tcfg, lora_cfg)
        tower = (_shared_tower_feats(params, student_cfg, batch, tcfg)
                 if share_tower else None)
        out, w_s = _student_forward(params, cfg=student_cfg, batch=batch,
                                    tcfg=tcfg, lora_cfg=lora_cfg,
                                    tower_feats=tower)
        h_t, w_t = teacher_forward(teacher_params, batch, tower)
        metrics: Metrics = {}
        if tcfg.align_loss_type == "kd_lm":
            # fused: ONE streaming pass over the student logits for both
            # losses (ops/losses.chunked_kd_ce)
            fused = kd_ce_align_loss(
                out.hidden, w_s, h_t, w_t, batch.labels,
                vocab_limit=vocab_limit,
                distill_all_tokens=tcfg.distill_all_tokens,
                chunk=tcfg.vocab_chunk, int8_dh=tcfg.kd_int8_dh,
                stream_dh=tcfg.kd_stream_dh)
            loss = fused.kd_loss + fused.ce_loss
            metrics["loss/align"] = fused.kd_loss
            metrics["loss/lm"] = fused.ce_loss
            metrics["num_tokens"] = fused.kd_tokens
        else:
            kd = kd_align_loss(out.hidden, w_s, h_t, w_t, batch.labels,
                               vocab_limit=vocab_limit,
                               distill_all_tokens=tcfg.distill_all_tokens,
                               chunk=tcfg.vocab_chunk,
                               int8_dh=tcfg.kd_int8_dh,
                stream_dh=tcfg.kd_stream_dh)
            loss = kd.loss
            metrics["loss/align"] = kd.loss
            metrics["num_tokens"] = kd.num_tokens
        if student_cfg.llm.is_moe and tcfg.moe_loss_enable:
            moe = student_cfg.llm.router_aux_loss_coef * out.aux_loss
            loss = loss + moe
            metrics["loss/moe_balance"] = out.aux_loss
        metrics["loss"] = loss
        return loss, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, teacher_params, batch: MultimodalBatch):
        (_, metrics), grads = _grad_fn(loss_fn)(
            state.params, teacher_params, batch)
        updates, new_opt = opt(state.params).update(grads, state.opt_state,
                                                    state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, new_opt), metrics

    return step


# ---------------------------------------------------------------------------
# stage 3: preference (DPO) distillation
# ---------------------------------------------------------------------------

def _concat_pair_batch(d: Dict[str, Any]) -> MultimodalBatch:
    """Stack chosen+rejected into one [2B] batch sharing the images.

    The pixel tensor stays [B, M, ...]: both halves carry the SAME
    image_pos row indices into the flattened [B*M*N] feature rows, so each
    image is encoded once per step (the reference instead runs the vision
    tower on chosen and rejected separately inside its 4 forwards,
    dpo_trainer.py:564-641)."""
    chosen = batch_from_arrays(d, "chosen_")
    rejected = batch_from_arrays(d, "rejected_")

    def cat(a, b_):
        return jnp.concatenate([a, b_], axis=0)

    return MultimodalBatch(
        input_ids=cat(chosen.input_ids, rejected.input_ids),
        segment_ids=cat(chosen.segment_ids, rejected.segment_ids),
        image_mask=cat(chosen.image_mask, rejected.image_mask),
        image_pos=cat(chosen.image_pos, rejected.image_pos),
        pixels=chosen.pixels,
        pixel_valid=chosen.pixel_valid,
        labels=cat(chosen.labels, rejected.labels),
    )


def make_dpo_step(policy_cfg: LlavaConfig, ref_cfg: LlavaConfig,
                  tcfg: TrainConfig, lora_cfg=None) -> Callable:
    """step(state, ref_params, batch_dict_arrays) -> (state, metrics)."""
    opt = build_optimizer_cached(tcfg, lora_cfg)
    share_tower = _can_share_tower(tcfg, policy_cfg, ref_cfg)
    # frozen policy head (the d2s train set carried into stage 3) => the
    # logp backward streams p@W in the forward; the ref side is
    # stop-gradient'd (no backward at all), so streaming is policy-only
    pol_stream = _head_weight_frozen(policy_cfg, tcfg, lora_cfg)

    def paired_forward(params, cfg, batch2b, train, tower_feats):
        dtype = _DTYPES[tcfg.compute_dtype]
        cp = _cast_tree(_effective_params(params, lora_cfg), dtype)
        cb = batch2b._replace(pixels=batch2b.pixels.astype(dtype))
        out = llava.forward(cp, cfg, cb, train=train,
                            remat=tcfg.remat and train,
                            attn_impl=tcfg.attn_impl,
                            tower_feats=tower_feats)
        w = llava.lm_head_weight(cp, cfg)
        logps = sequence_log_prob(out.hidden, w, batch2b.labels,
                                  chunk=tcfg.vocab_chunk,
                                  stream_dh=train and pol_stream)
        b2 = logps.shape[0]
        return logps[: b2 // 2], logps[b2 // 2:], out

    def loss_fn(params, ref_params, batch2b):
        params = _stop_frozen(params, tcfg, lora_cfg)
        tower = (_shared_tower_feats(params, policy_cfg, batch2b, tcfg)
                 if share_tower else None)
        pc, pr, pol_out = paired_forward(params, policy_cfg, batch2b, True,
                                         tower)
        rc, rr, _ = paired_forward(
            jax.lax.stop_gradient(ref_params), ref_cfg, batch2b, False, tower)
        rc = jax.lax.stop_gradient(rc)
        rr = jax.lax.stop_gradient(rr)
        out = dpo_loss(pc, pr, rc, rr, beta=tcfg.dpo_beta,
                       label_smoothing=tcfg.dpo_label_smoothing,
                       loss_type=tcfg.dpo_loss_type,
                       reference_free=tcfg.reference_free)
        loss = out.losses.mean()
        acc = (out.chosen_rewards > out.rejected_rewards).astype(jnp.float32)
        metrics: Metrics = {
            "loss/dpo": loss,
            "rewards/chosen": out.chosen_rewards.mean(),
            "rewards/rejected": out.rejected_rewards.mean(),
            "rewards/accuracies": acc.mean(),
            "rewards/margins": (out.chosen_rewards - out.rejected_rewards).mean(),
            "logps/chosen": pc.mean(),
            "logps/rejected": pr.mean(),
        }
        if policy_cfg.llm.is_moe and tcfg.moe_loss_enable:
            moe = policy_cfg.llm.router_aux_loss_coef * pol_out.aux_loss
            loss = loss + moe
            metrics["loss/moe_balance"] = pol_out.aux_loss
        metrics["loss"] = loss
        return loss, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, ref_params, batch2b):
        (_, metrics), grads = _grad_fn(loss_fn)(
            state.params, ref_params, batch2b)
        updates, new_opt = opt(state.params).update(grads, state.opt_state,
                                                    state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, new_opt), metrics

    def step(state: TrainState, ref_params, batch_dict: Dict[str, Any]):
        return _step(state, ref_params, _concat_pair_batch(batch_dict))

    return step
