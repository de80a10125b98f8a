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
    sequence_log_prob,
    softmax_cross_entropy,
)
from llavamod_tpu.train.config import TrainConfig
from llavamod_tpu.train.optim import TrainState, build_optimizer

Metrics = Dict[str, jnp.ndarray]

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "float16": jnp.float16}


def _cast_tree(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


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
    )


def _student_forward(params, cfg: LlavaConfig, batch: MultimodalBatch,
                     tcfg: TrainConfig):
    dtype = _DTYPES[tcfg.compute_dtype]
    cparams = _cast_tree(params, dtype)
    cbatch = batch._replace(pixels=batch.pixels.astype(dtype))
    out = llava.forward(cparams, cfg, cbatch, train=True, remat=tcfg.remat)
    w_head = llava.lm_head_weight(cparams, cfg)
    return out, w_head


def _moe_metrics(out, cfg: LlavaConfig) -> Metrics:
    m: Metrics = {}
    if cfg.llm.is_moe:
        m["loss/moe_balance"] = out.aux_loss
    return m


# ---------------------------------------------------------------------------
# stage 1 / SFT
# ---------------------------------------------------------------------------

def make_pretrain_step(cfg: LlavaConfig, tcfg: TrainConfig) -> Callable:
    opt = build_optimizer_cached(tcfg)

    def loss_fn(params, batch: MultimodalBatch):
        out, w_head = _student_forward(params, cfg, batch, tcfg)
        ce = softmax_cross_entropy(out.hidden, w_head, batch.labels,
                                   chunk=tcfg.vocab_chunk)
        loss = ce.loss
        metrics = {"loss/lm": ce.loss, "num_tokens": ce.num_tokens}
        if cfg.llm.is_moe and tcfg.moe_loss_enable:
            moe = cfg.llm.router_aux_loss_coef * out.aux_loss
            loss = loss + moe
            metrics["loss/moe_balance"] = out.aux_loss
        metrics["loss"] = loss
        return loss, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: MultimodalBatch) -> Tuple[TrainState, Metrics]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, new_opt = opt(state.params).update(grads, state.opt_state,
                                                    state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, new_opt), metrics

    return step


def build_optimizer_cached(tcfg: TrainConfig):
    cache = {}

    def get(params):
        if "opt" not in cache:
            cache["opt"] = build_optimizer(params, tcfg)
        return cache["opt"]

    return get


# ---------------------------------------------------------------------------
# stage 2: mimic (KD) distillation
# ---------------------------------------------------------------------------

def make_align_step(student_cfg: LlavaConfig, teacher_cfg: LlavaConfig,
                    tcfg: TrainConfig) -> Callable:
    """step(state, teacher_params, batch) -> (state, metrics).

    Loss = KD (+ student CE if kd_lm) + router aux * coef
    (align_trainer.py:570-580)."""
    opt = build_optimizer_cached(tcfg)
    vocab_limit = tcfg.kd_vocab_limit or min(student_cfg.llm.vocab_size,
                                             teacher_cfg.llm.vocab_size)

    def teacher_forward(teacher_params, batch):
        dtype = _DTYPES[tcfg.compute_dtype]
        tp = _cast_tree(teacher_params, dtype)
        tb = batch._replace(pixels=batch.pixels.astype(dtype))
        out = llava.forward(tp, teacher_cfg, tb, train=False)
        w = llava.lm_head_weight(tp, teacher_cfg)
        return jax.lax.stop_gradient(out.hidden), jax.lax.stop_gradient(w)

    def loss_fn(params, teacher_params, batch: MultimodalBatch):
        out, w_s = _student_forward(params, cfg=student_cfg, batch=batch,
                                    tcfg=tcfg)
        h_t, w_t = teacher_forward(teacher_params, batch)
        kd = kd_align_loss(out.hidden, w_s, h_t, w_t, batch.labels,
                           vocab_limit=vocab_limit,
                           distill_all_tokens=tcfg.distill_all_tokens,
                           chunk=tcfg.vocab_chunk)
        loss = kd.loss
        metrics: Metrics = {"loss/align": kd.loss, "num_tokens": kd.num_tokens}
        if tcfg.align_loss_type == "kd_lm":
            ce = softmax_cross_entropy(out.hidden, w_s, batch.labels,
                                       chunk=tcfg.vocab_chunk)
            loss = loss + ce.loss
            metrics["loss/lm"] = ce.loss
        if student_cfg.llm.is_moe and tcfg.moe_loss_enable:
            moe = student_cfg.llm.router_aux_loss_coef * out.aux_loss
            loss = loss + moe
            metrics["loss/moe_balance"] = out.aux_loss
        metrics["loss"] = loss
        return loss, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, teacher_params, batch: MultimodalBatch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
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

    image_pos indexes flattened [B*M*N] rows; the rejected half reuses the
    same pixel rows, and pixels are passed once and tiled on device."""
    chosen = batch_from_arrays(d, "chosen_")
    rejected = batch_from_arrays(d, "rejected_")
    pixels = jnp.concatenate([chosen.pixels, chosen.pixels], axis=0)
    valid = jnp.concatenate([chosen.pixel_valid, chosen.pixel_valid], axis=0)

    def cat(a, b_):
        return jnp.concatenate([a, b_], axis=0)

    return MultimodalBatch(
        input_ids=cat(chosen.input_ids, rejected.input_ids),
        segment_ids=cat(chosen.segment_ids, rejected.segment_ids),
        image_mask=cat(chosen.image_mask, rejected.image_mask),
        image_pos=cat(chosen.image_pos, rejected.image_pos),  # fixed in step
        pixels=pixels,
        pixel_valid=valid,
        labels=cat(chosen.labels, rejected.labels),
    )


def make_dpo_step(policy_cfg: LlavaConfig, ref_cfg: LlavaConfig,
                  tcfg: TrainConfig) -> Callable:
    """step(state, ref_params, batch_dict_arrays) -> (state, metrics)."""
    opt = build_optimizer_cached(tcfg)
    num_img_tokens = policy_cfg.num_image_tokens

    def paired_forward(params, cfg, batch2b, train):
        dtype = _DTYPES[tcfg.compute_dtype]
        cp = _cast_tree(params, dtype)
        cb = batch2b._replace(pixels=batch2b.pixels.astype(dtype))
        out = llava.forward(cp, cfg, cb, train=train, remat=tcfg.remat and train)
        w = llava.lm_head_weight(cp, cfg)
        logps = sequence_log_prob(out.hidden, w, batch2b.labels,
                                  chunk=tcfg.vocab_chunk)
        b2 = logps.shape[0]
        return logps[: b2 // 2], logps[b2 // 2:], out

    def fix_image_pos(batch2b: MultimodalBatch, b: int, m: int) -> MultimodalBatch:
        # second half of the batch gathers from the tiled second pixel copy
        rows_per_half = b * m * num_img_tokens
        pos = batch2b.image_pos
        pos = pos.at[b:].add(rows_per_half)
        return batch2b._replace(image_pos=pos)

    def loss_fn(params, ref_params, batch2b, b, m):
        batch2b = fix_image_pos(batch2b, b, m)
        pc, pr, pol_out = paired_forward(params, policy_cfg, batch2b, True)
        rc, rr, _ = paired_forward(
            jax.lax.stop_gradient(ref_params), ref_cfg, batch2b, False)
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

    @functools.partial(jax.jit, static_argnums=(3, 4), donate_argnums=(0,))
    def _step(state: TrainState, ref_params, batch2b, b, m):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, ref_params, batch2b, b, m)
        updates, new_opt = opt(state.params).update(grads, state.opt_state,
                                                    state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, new_opt), metrics

    def step(state: TrainState, ref_params, batch_dict: Dict[str, Any]):
        b, m = np.asarray(batch_dict["pixel_valid"]).shape
        batch2b = _concat_pair_batch(batch_dict)
        return _step(state, ref_params, batch2b, b, m)

    return step
