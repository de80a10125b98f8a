"""Optimizer construction with parameter groups.

Replaces LLaVATrainer.create_optimizer (reference train/llava_trainer.py:152-252):
  * decay / no-decay split (no decay for rank<2 params: norms, biases),
  * separate projector learning rate (`mm_projector_lr`),
  * trainable-set masking (stage-1 projector-only; align/dpo train_modules;
    frozen vision tower) — frozen params get zero updates instead of the
    reference's requires_grad_ bookkeeping,
  * MoE params need no special "group splitting" (reference
    llava_trainer.py:223-228 splits them for DeepSpeed's partitioner);
    with pjit, expert params are just sharded on the 'expert' axis.

All masks are pytree-structural and jit-compatible.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from llavamod_tpu.train.config import TrainConfig


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def trainable_mask(params, cfg: TrainConfig, lora_cfg=None) -> Any:
    """True where the param receives updates.

    Mirrors the reference's freezing logic: stage-1 trains only the projector
    (train/train.py:478-481); vision tower always frozen
    (clip_encoder.py:31); align/dpo optionally restrict to `train_modules`
    (llava_qwen1_5_moe.py:496-506).

    LoRA-split trees ({'base','lora'}): every adapter leaf trains; base
    leaves follow the normal rules EXCEPT params that carry an adapter
    (PEFT freezes the wrapped base weight, align_train.py:290-327)."""
    has_lora = isinstance(params, dict) and "lora" in params and "base" in params

    def decide(path, leaf):
        p = _path_str(path)
        if has_lora:
            side, _, p = p.partition("/")
            if side == "lora":
                return True
            if lora_cfg is not None:
                from llavamod_tpu.models.lora import _is_target

                if _is_target(p, lora_cfg):
                    return False
        if p.startswith("vision"):
            return False
        # the video projector is part of the reference's mm_projector bundle
        # (build_projector, builder.py:125-205) — same freeze/LR rules
        is_projector = p.startswith("projector") or p.startswith("video_projector")
        if cfg.tune_mm_mlp_adapter:
            # stage-1 adaptor init trains ONLY the projector; driven by the
            # flag, not the script — the reference's train.py also does full
            # SFT / MoE-SFT when the flag is off (train/train.py:478-495)
            return is_projector
        if is_projector and cfg.freeze_mm_mlp_adapter:
            return False
        if cfg.train_modules:
            return is_projector or any(m in p for m in cfg.train_modules)
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def _label_tree(params, cfg: TrainConfig, lora_cfg=None):
    """Labels: frozen | projector | default (used by multi_transform)."""
    mask = trainable_mask(params, cfg, lora_cfg)

    def decide(path, leaf, trainable):
        if not trainable:
            return "frozen"
        p = _path_str(path)
        if p.startswith("base/"):
            p = p[len("base/"):]
        if (p.startswith("projector") or p.startswith("video_projector")) \
                and cfg.mm_projector_lr:
            return "projector"
        return "default"

    return jax.tree_util.tree_map_with_path(decide, params, mask)


def make_lr_schedule(cfg: TrainConfig, base_lr: float) -> optax.Schedule:
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 0)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, cfg.total_steps, end_value=0.0)
    if cfg.lr_schedule == "linear":
        return optax.join_schedules([
            optax.linear_schedule(0.0, base_lr, warmup),
            optax.linear_schedule(base_lr, 0.0, cfg.total_steps - warmup),
        ], [warmup])
    return optax.constant_schedule(base_lr)


def _adamw(cfg: TrainConfig, lr: float) -> optax.GradientTransformation:
    decay_mask = lambda params: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.ndim(x) >= 2, params)
    return optax.adamw(
        learning_rate=make_lr_schedule(cfg, lr),
        b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay, mask=decay_mask)


def _adafactor(cfg: TrainConfig, lr: float) -> optax.GradientTransformation:
    """Memory-feasible optimizer for full-FFN train sets on one chip.

    Factored second moment (rows+cols instead of a full m+v copy per
    param — Shazeer & Stern 2018) cuts optimizer state from 2x trainable
    bytes to ~(rows+cols) per matrix: the record train set's 2.03B
    trainable params go from 8.1 GB bf16 Adam state to ~2 MB.  Momentum
    stays off (classic Adafactor); update clipping (d=1.0) replaces
    global grad-norm clipping, per the paper.
    """
    return optax.adafactor(
        learning_rate=make_lr_schedule(cfg, lr),
        decay_rate=0.8,
        multiply_by_parameter_scale=True,
        clipping_threshold=1.0,
        momentum=None,
        weight_decay_rate=cfg.weight_decay or None)


def _base_tx(cfg: TrainConfig, lr: float) -> optax.GradientTransformation:
    if cfg.optimizer == "adafactor":
        return _adafactor(cfg, lr)
    assert cfg.optimizer == "adamw", cfg.optimizer
    return _adamw(cfg, lr)


def build_optimizer(params, cfg: TrainConfig,
                    lora_cfg=None) -> optax.GradientTransformation:
    labels = _label_tree(params, cfg, lora_cfg)
    transforms = {
        "default": _base_tx(cfg, cfg.learning_rate),
        "projector": _base_tx(cfg, cfg.mm_projector_lr or cfg.learning_rate),
        "frozen": optax.set_to_zero(),
    }
    tx = optax.multi_transform(transforms, labels)
    chain = []
    if cfg.max_grad_norm and cfg.optimizer != "adafactor":
        # Adafactor replaces global grad-norm clipping with per-param
        # update clipping (clipping_threshold=1.0, the paper's scheme)
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    chain.append(tx)
    opt = optax.chain(*chain)
    if cfg.grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, cfg.grad_accum_steps)
    return opt


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, cfg: TrainConfig, lora_cfg=None) -> "TrainState":
        opt = build_optimizer(params, cfg, lora_cfg)
        return cls(jnp.zeros((), jnp.int32), params, opt.init(params))


def apply_updates(state: TrainState, grads, cfg: TrainConfig,
                  lora_cfg=None) -> TrainState:
    opt = build_optimizer(state.params, cfg, lora_cfg)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, new_params, new_opt)
