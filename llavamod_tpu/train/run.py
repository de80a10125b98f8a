"""Training entry points for the three pipeline stages.

TPU-native equivalent of the reference's three drivers —
train/train.py:19 (stage-1 pretrain / SFT / MoE-SFT),
train/align_train.py:515 (mimic distillation),
train/dpo_train.py:543-556 (preference distillation) — with one shared
engine: build model(s) -> freeze/LoRA/upcycle -> data module -> jitted step
-> loop with metric logging, periodic checkpoints, and auto-resume.

Usage (see also the thin wrappers train.py / align_train.py / dpo_train.py):

    python -m llavamod_tpu.train.run --stage pretrain \
        --model_name_or_path qwen1.5-0.5b --data_path caps.json \
        --image_folder imgs/ --tune_mm_mlp_adapter true --output_dir out/

Differences from the reference by design:
  * no deepspeed launcher — one process drives all local chips through a
    jax.sharding.Mesh (data/fsdp/expert/tensor axes);
  * the teacher is a second frozen param tree inside the SAME jitted step,
    not a separate ZeRO engine (align_trainer.py:436-453);
  * stringly-typed model dispatch is replaced by explicit registries.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import time
from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np

from llavamod_tpu.train.args import (
    AlignArgs,
    DataArgs,
    DPOArgs,
    ModelArgs,
    TrainArgs,
    parse_into_dataclasses,
    train_config_from_args,
)
from llavamod_tpu.train.config import TrainConfig
from llavamod_tpu.utils.logging import rank0_print

# reference module names (shells pass e.g. `--train_modules mlp.gate_proj wg`,
# dense2sparse_distillation.sh:56) -> our param-tree path fragments.
# '/gate' etc. deliberately match BOTH dense '.../mlp/gate' and expert
# '.../mlp/experts/gate' paths — in the reference the freeze runs before
# MoE expansion, so expert copies inherit the dense FFN's trainability
# (initialize_moe_modules, llava_qwen1_5_moe.py:501-546).
_TRAIN_MODULE_ALIASES = {
    "mlp.gate_proj": "/gate",
    "mlp.up_proj": "/up",
    "mlp.down_proj": "/down",
    "gate_proj": "/gate",
    "up_proj": "/up",
    "down_proj": "/down",
    "wg": "router",
    "mlp.w1": "/gate",
    "mlp.w2": "/up",
    "mlp.c_proj": "/down",
    "fc1": "/up",
    "fc2": "/down",
}


def translate_train_modules(mods) -> Optional[Tuple[str, ...]]:
    if not mods:
        return None
    return tuple(_TRAIN_MODULE_ALIASES.get(m, m) for m in mods)


# ---------------------------------------------------------------------------
# model construction
# ---------------------------------------------------------------------------

def build_llava(name_or_path: str, margs: ModelArgs, *, seed: int = 0,
                dtype_str: str = "float32"):
    """Resolve a model spec to (LlavaConfig, params).

    Specs: a native checkpoint dir (llavamod_config.json), an HF checkpoint
    dir (config.json), or a registered preset name ('qwen1.5-0.5b', ...)
    which is initialized from scratch."""
    import jax.numpy as jnp

    from llavamod_tpu.models import builder as model_builder

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_str]
    if os.path.isdir(name_or_path):
        if os.path.exists(os.path.join(name_or_path, model_builder.CONFIG_NAME)):
            cfg, params = model_builder.load_model(name_or_path)
        else:
            cfg, params = model_builder.import_hf_llava(
                name_or_path,
                projector_type=margs.image_projector_type,
                select_layer=margs.mm_vision_select_layer)
        missing = [k for k in ("vision", "projector", "llm") if k not in params]
        if missing:
            params = _fill_missing(cfg, params, missing, seed, dtype)
        return cfg, params

    import jax

    from llavamod_tpu.models import llava as llava_mod
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import llm_configs
    from llavamod_tpu.models.vision.vit import vision_configs

    llm_cfg = llm_configs.get(name_or_path)
    vis_cfg = vision_configs.get(margs.image_tower)
    s2_scales = (tuple(int(s) for s in margs.s2_scales.split(","))
                 if margs.s2 else ())
    cfg = LlavaConfig(
        llm=llm_cfg, vision=vis_cfg,
        projector_type=margs.image_projector_type,
        select_layer=margs.mm_vision_select_layer,
        select_feature=margs.mm_vision_select_feature,
        s2_scales=s2_scales,
        # video projector bundle (reference builder.py:125-205), enabled by
        # --video_tower; frames run through the IMAGE tower (the reference
        # stubs dedicated video towers out, multimodal_encoder/builder.py:39)
        video_projector_type=(margs.video_projector_type
                              if margs.video_tower else None),
        video_global_proj=margs.video_global_proj,
        video_temporal_proj=margs.video_temproal_proj,
        video_spatial_proj=margs.video_spatial_proj)
    params = llava_mod.init(cfg, jax.random.PRNGKey(seed), dtype=dtype)
    return cfg, params


def _fill_missing(cfg, params, missing, seed, dtype):
    import jax

    from llavamod_tpu.models import llava as llava_mod

    full = llava_mod.init(cfg, jax.random.PRNGKey(seed), dtype=dtype)
    for k in missing:
        rank0_print(f"[build] '{k}' missing from checkpoint; fresh init")
        params[k] = full[k]
    return params


def maybe_load_mm_adapter(params, path: Optional[str], projector_type: str):
    if path:
        from llavamod_tpu.train.checkpoint import load_mm_projector

        params["projector"] = load_mm_projector(
            path, projector_type, template=params.get("projector"))
        rank0_print(f"[build] loaded mm projector from {path}")
    return params


def maybe_upcycle(cfg, params, margs: ModelArgs):
    """Dense -> sparse MoE student (initialize_moe_modules equivalent)."""
    if cfg.llm.is_moe:
        return cfg, params  # already sparse (moe_finetune/resume path)
    from llavamod_tpu.models.llm.upcycle import upcycle

    moe_llm_cfg, moe_llm_params = upcycle(
        cfg.llm, params["llm"], moe_mode=margs.moe_mode,
        moe_layers_idx=margs.moe_layers_idx,
        num_experts=margs.num_experts, top_k=margs.top_k_experts,
        capacity_factor=margs.capacity_factor,
        eval_capacity_factor=margs.eval_capacity_factor,
        min_capacity=margs.min_capacity, use_residual=margs.use_residual,
        router_aux_loss_coef=margs.router_aux_loss_coef)
    cfg = cfg.replace(llm=moe_llm_cfg)
    params = dict(params)
    params["llm"] = moe_llm_params
    rank0_print(f"[build] upcycled to MoE: layers={moe_llm_cfg.moe_layers} "
                f"experts={moe_llm_cfg.moe_num_experts}")
    return cfg, params


def maybe_add_lora(params, margs: ModelArgs, seed: int):
    """Returns (params_or_split_tree, lora_cfg or None)."""
    if not margs.lora_enable:
        return params, None
    import jax

    from llavamod_tpu.models.lora import DEFAULT_TARGETS, LoraConfig, init_lora

    ffn_only = (
        r"llm/layers/\d+/mlp/(gate|up|down)$",
        r"llm/layers/\d+/mlp/experts/(gate|up|down)$",
    )
    lcfg = LoraConfig(r=margs.lora_r, alpha=margs.lora_alpha,
                      dropout=margs.lora_dropout,
                      target_patterns=ffn_only if margs.only_lora_ffn
                      else DEFAULT_TARGETS)
    lora = init_lora(params, lcfg, jax.random.PRNGKey(seed + 1))
    rank0_print(f"[build] LoRA adapters added (r={lcfg.r}, "
                f"ffn_only={margs.only_lora_ffn})")
    return {"base": params, "lora": lora}, lcfg


# ---------------------------------------------------------------------------
# data module
# ---------------------------------------------------------------------------

def build_data_module(stage: str, margs: ModelArgs, dargs: DataArgs,
                      targs: TrainArgs, tokenizer, cfg):
    from llavamod_tpu.data.collator import DPOCollator, SupervisedCollator
    from llavamod_tpu.data.dataset import (
        PreferenceJsonDataset,
        SupervisedJsonDataset,
    )
    from llavamod_tpu.models.builder import make_image_preprocessor
    from llavamod_tpu.train.loader import DataLoader
    from llavamod_tpu.train.sampler import LengthGroupedSampler, RandomSampler

    ds_cls = PreferenceJsonDataset if stage == "dpo" else SupervisedJsonDataset
    dataset = ds_cls(
        dargs.data_path, tokenizer, make_image_preprocessor(cfg),
        image_folder=dargs.image_folder,
        template_name=margs.version,
        model_max_length=targs.model_max_length,
        is_multimodal=dargs.is_multimodal,
        num_frames=(cfg.num_video_frames
                    if cfg.video_projector_type is not None
                    else dargs.num_frames),
        use_im_start_end=margs.mm_use_im_start_end,
        seed=targs.seed,
        video_projector=cfg.video_projector_type is not None)

    pad_id = getattr(tokenizer, "pad_token_id", 0) or 0
    coll_cls = DPOCollator if stage == "dpo" else SupervisedCollator
    coll_kw = {}
    if stage != "dpo" and cfg.video_projector_type is not None:
        coll_kw = dict(num_video_tokens=cfg.num_video_tokens,
                       num_video_frames=cfg.num_video_frames)
    collator = coll_cls(max_len=targs.model_max_length,
                        num_image_tokens=cfg.num_image_tokens,
                        image_size=cfg.vision.image_size,
                        max_images=cfg.max_images, pad_id=pad_id, **coll_kw)

    if targs.group_by_modality_length:
        sampler = LengthGroupedSampler(
            targs.per_device_train_batch_size,
            world_size=targs.gradient_accumulation_steps,
            lengths=dataset.modality_lengths,
            group_by_modality=True, seed=targs.seed)
    else:
        sampler = RandomSampler(len(dataset), seed=targs.seed)

    # Multi-host pod: every process loads only its rank-strided shard of the
    # (deterministic, identically seeded) global order; shard_batch then
    # assembles global arrays from the per-process slices.  Reference gets
    # this from the deepspeed launcher + sampler (llava_trainer.py:62-90).
    import jax

    if jax.process_count() > 1:
        from llavamod_tpu.train.sampler import ProcessShardSampler

        sampler = ProcessShardSampler(sampler, jax.process_index(),
                                      jax.process_count())
        rank0_print(f"[data] process-sharded sampler: "
                    f"{jax.process_index()}/{jax.process_count()}")

    return DataLoader(dataset, targs.per_device_train_batch_size, collator,
                      sampler=sampler, drop_last=True,
                      num_workers=targs.dataloader_num_workers)


# ---------------------------------------------------------------------------
# mesh / sharding
# ---------------------------------------------------------------------------

class _DeviceContext:
    """Holds the (optional) mesh and shards params/batches onto it."""

    def __init__(self, targs: TrainArgs):
        import jax

        n = jax.device_count()
        need = (targs.data_parallel * targs.expert_parallel
                * targs.tensor_parallel * targs.pipeline_parallel)
        self.mesh = None
        if n > 1 or need > 1:
            from llavamod_tpu.parallel.mesh import MeshConfig, make_mesh

            fsdp = n // need
            assert fsdp * need == n, (
                f"{n} devices not divisible by "
                f"data*expert*tensor*pipe={need}")
            self.mesh = make_mesh(MeshConfig(
                data=targs.data_parallel, fsdp=fsdp,
                expert=targs.expert_parallel, tensor=targs.tensor_parallel,
                pipe=targs.pipeline_parallel))
            rank0_print(f"[mesh] {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}")

    def __enter__(self):
        if self.mesh is not None:
            import jax

            self._ctx = jax.set_mesh(self.mesh)
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self.mesh is not None:
            self._ctx.__exit__(*exc)

    def shard_params(self, params):
        if self.mesh is None:
            return params
        from llavamod_tpu.parallel.sharding import shard_params

        return shard_params(self.mesh, params)

    def shard_batch(self, batch):
        if self.mesh is None:
            return batch
        from llavamod_tpu.parallel.sharding import shard_batch

        return shard_batch(self.mesh, batch)


# ---------------------------------------------------------------------------
# metric logging
# ---------------------------------------------------------------------------

class MetricLogger:
    """Accumulate step metrics; emit means every logging_steps
    (reference store_metrics/log, align_trainer.py:596-614) to the console,
    to <output_dir>/metrics.jsonl, and to wandb when available."""

    def __init__(self, targs: TrainArgs, total_steps: int):
        self.every = max(1, targs.logging_steps)
        self.total = total_steps
        self.acc: Dict[str, float] = {}
        self.n = 0
        self.t0 = time.time()
        self.wandb = None
        self.jsonl = None
        try:
            os.makedirs(targs.output_dir, exist_ok=True)
            self.jsonl = open(os.path.join(targs.output_dir,
                                           "metrics.jsonl"), "a")
        except OSError as exc:
            rank0_print(f"[log] metrics.jsonl unavailable ({exc})")
        if targs.report_to == "wandb":
            try:
                import wandb  # type: ignore

                self.wandb = wandb
                wandb.init(project="llavamod_tpu", name=targs.run_name,
                           config=dataclasses.asdict(targs))
            except Exception as exc:  # wandb absent/offline: log locally only
                rank0_print(f"[log] wandb unavailable ({exc}); console only")

    def update(self, step: int, metrics: Dict[str, Any]) -> None:
        for k, v in metrics.items():
            self.acc[k] = self.acc.get(k, 0.0) + float(v)
        self.n += 1
        if step % self.every == 0:
            means = {k: v / self.n for k, v in self.acc.items()}
            dt = (time.time() - self.t0) / self.n
            parts = " ".join(f"{k}={v:.4g}" for k, v in sorted(means.items()))
            rank0_print(f"[step {step}/{self.total}] {parts} "
                        f"({dt:.2f}s/step)")
            if self.jsonl is not None:
                self.jsonl.write(json.dumps(
                    {"step": step, "sec_per_step": round(dt, 4), **means}) + "\n")
                self.jsonl.flush()
            if self.wandb is not None:
                self.wandb.log(means, step=step)
            self.acc, self.n, self.t0 = {}, 0, time.time()


# ---------------------------------------------------------------------------
# checkpointing helpers
# ---------------------------------------------------------------------------

def _save_periodic(output_dir: str, step: int, state, targs: TrainArgs,
                   tcfg: TrainConfig, cfg, save_total_limit: Optional[int]):
    from llavamod_tpu.train.checkpoint import save_checkpoint, save_mm_projector

    path = save_checkpoint(output_dir, step, state)
    rank0_print(f"[ckpt] saved {path}")
    if tcfg.tune_mm_mlp_adapter or tcfg.stage == "pretrain":
        # stage-1 semantics: the artifact of record is mm_projector.bin
        # (llava_trainer.py:256-275)
        proj = _params_of(state)["projector"]
        save_mm_projector(os.path.join(path, "mm_projector.bin"),
                          _to_np(proj), cfg.projector_type)
    if save_total_limit:
        _prune_checkpoints(output_dir, save_total_limit)


def _prune_checkpoints(output_dir: str, keep: int):
    import re

    ckpts = []
    for name in os.listdir(output_dir):
        m = re.match(r"^checkpoint-(\d+)$", name)
        if m:
            ckpts.append((int(m.group(1)), os.path.join(output_dir, name)))
    for _, path in sorted(ckpts)[:-keep]:
        shutil.rmtree(path, ignore_errors=True)


def _params_of(state):
    p = state.params
    if isinstance(p, dict) and "base" in p and "lora" in p:
        return p["base"]
    return p


def _to_np(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def final_save(output_dir: str, cfg, state, lora_cfg, margs: ModelArgs,
               tcfg: TrainConfig):
    """Save flavors per reference train.py:535-557: LoRA merged + full
    state; stage-1 additionally exports mm_projector.bin."""
    from llavamod_tpu.models.builder import save_model
    from llavamod_tpu.train.checkpoint import save_mm_projector

    params = state.params
    if lora_cfg is not None:
        from llavamod_tpu.models.lora import merge_lora, save_lora_adapter

        save_lora_adapter(os.path.join(output_dir, "adapter"),
                          params["lora"], lora_cfg)
        params = merge_lora(params["base"], params["lora"], lora_cfg)
    params = _to_np(params)
    from llavamod_tpu.models.llm.decoder import unstack_layers

    params = dict(params)
    params["llm"] = unstack_layers(cfg.llm, params["llm"])  # no-op if plain
    save_model(output_dir, cfg, params)
    if tcfg.tune_mm_mlp_adapter or tcfg.stage == "pretrain":
        save_mm_projector(os.path.join(output_dir, "mm_projector.bin"),
                          params["projector"], cfg.projector_type)
    rank0_print(f"[ckpt] final model saved to {output_dir}")


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------

def run_stage(stage: str, margs: ModelArgs, dargs: DataArgs, targs: TrainArgs,
              salign: Optional[AlignArgs] = None,
              sdpo: Optional[DPOArgs] = None,
              tokenizer=None) -> Dict[str, float]:
    """Run one full training stage; returns the last logged metrics."""
    import jax

    from llavamod_tpu.train.checkpoint import maybe_auto_resume
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.steps import (
        batch_from_arrays,
        make_align_step,
        make_dpo_step,
        make_pretrain_step,
    )

    assert stage in ("pretrain", "finetune", "align", "dpo"), stage
    _maybe_init_multihost()
    if tokenizer is None:
        tokenizer = load_tokenizer(margs)

    # ---- models ----
    policy_spec = margs.model_name_or_path
    teacher_cfg = teacher_params = None
    if stage == "align":
        policy_spec = salign.policy_model_name_or_path or policy_spec
        cfg, params = build_llava(policy_spec, margs, seed=targs.seed)
        params = maybe_load_mm_adapter(
            params, salign.policy_pretrain_mm_mlp_adapter or
            margs.pretrain_mm_mlp_adapter, cfg.projector_type)
        if salign.policy_model_type == "sparse" and margs.moe_enable:
            cfg, params = maybe_upcycle(cfg, params, margs)
        teacher_cfg, teacher_params = build_llava(
            salign.ref_model_name_or_path, margs, seed=targs.seed + 7)
        teacher_params = maybe_load_mm_adapter(
            teacher_params, salign.ref_pretrain_mm_mlp_adapter,
            teacher_cfg.projector_type)
    elif stage == "dpo":
        policy_spec = sdpo.policy_model_name_or_path or policy_spec
        cfg, params = build_llava(policy_spec, margs, seed=targs.seed)
        teacher_cfg, teacher_params = build_llava(
            sdpo.ref_model_name_or_path, margs, seed=targs.seed + 7)
    else:
        cfg, params = build_llava(policy_spec, margs, seed=targs.seed)
        params = maybe_load_mm_adapter(params, margs.pretrain_mm_mlp_adapter,
                                       cfg.projector_type)
        if margs.moe_enable and not targs.moe_finetune:
            cfg, params = maybe_upcycle(cfg, params, margs)

    params, lora_cfg = maybe_add_lora(params, margs, targs.seed)

    # ---- data ----
    loader = build_data_module(stage, margs, dargs, targs, tokenizer, cfg)
    steps_per_epoch = max(1, len(loader))
    total_steps = (targs.max_steps if targs.max_steps > 0
                   else int(steps_per_epoch * targs.num_train_epochs))
    rank0_print(f"[run] stage={stage} steps/epoch={steps_per_epoch} "
                f"total_steps={total_steps}")

    margs.train_modules = translate_train_modules(margs.train_modules)
    tcfg = train_config_from_args(stage, targs, total_steps, margs,
                                  salign, sdpo)

    # the frozen tower is shared with the teacher when configs match —
    # drop the teacher's own copy so it never occupies HBM
    if teacher_params is not None:
        from llavamod_tpu.train.steps import _can_share_tower

        if _can_share_tower(tcfg, cfg, teacher_cfg) and "vision" in teacher_params:
            teacher_params = {k: v for k, v in teacher_params.items()
                              if k != "vision"}
        stage_args = salign or sdpo
        rq = getattr(stage_args, "ref_quant", "") if stage_args else ""
        if rq in ("int8", "int8_head"):
            from llavamod_tpu.models.llm.decoder import quantize_decoder_int8

            teacher_params = dict(teacher_params)
            teacher_params["llm"] = quantize_decoder_int8(
                teacher_params["llm"], include_lm_head=(rq == "int8_head"))
            rank0_print("[build] teacher attention/MLP quantized to int8 "
                        "(W8A8)" + (" + int8 LM head" if rq == "int8_head"
                                    else ""))

    if targs.sequence_parallel and targs.tensor_parallel > 1:
        cfg = cfg.replace(llm=cfg.llm.replace(seq_shard_activations=True))
        if teacher_cfg is not None:
            teacher_cfg = teacher_cfg.replace(
                llm=teacher_cfg.llm.replace(seq_shard_activations=True))
        rank0_print("[mesh] sequence parallelism on: residual stream "
                    f"T-sharded over tensor={targs.tensor_parallel}")

    if targs.pipeline_parallel > 1:
        mb = targs.pipeline_microbatches
        cfg = cfg.replace(llm=cfg.llm.replace(pipeline_microbatches=mb))
        if teacher_cfg is not None:
            teacher_cfg = teacher_cfg.replace(
                llm=teacher_cfg.llm.replace(pipeline_microbatches=mb))
        rank0_print(f"[mesh] pipeline parallelism on: "
                    f"pipe={targs.pipeline_parallel}, "
                    f"microbatches={mb or targs.pipeline_parallel}")

    # Frozen-head recipes with --policy_head_quant: pre-quantize the student
    # head OUTSIDE the step — identical numerics (the head never updates),
    # and it removes the per-step [V, D] quantize pass + its 0.31 GB int8
    # HLO temp (part of the flagship OOM margin, BENCH_NOTES.md).  Tied-
    # embedding models keep the per-step path (the float embedding must
    # stay for input lookup).
    float_head_stash = None
    if (tcfg.student_head_quant and lora_cfg is None
            and "lm_head" in params.get("llm", {})):
        from llavamod_tpu.models.llm.decoder import quantize_head_int8

        params = dict(params)
        params["llm"] = dict(params["llm"])
        # stash the frozen float head on HOST (numpy) so checkpoints export
        # it; only the int8 copy lives in HBM during training
        float_head_stash = np.asarray(params["llm"]["lm_head"]["weight"])
        params["llm"]["lm_head"] = {"weight": quantize_head_int8(
            params["llm"]["lm_head"]["weight"])}
        rank0_print("[build] student LM head pre-quantized to int8 "
                    "(frozen-head recipe; float head stashed on host)")

    # Router-only recipes with --policy_body_quant: the whole frozen student
    # body (attention + dense MLP + experts) runs W8A8 on the int8 MXU —
    # forward numerics = the int8 serving path, router grads flow through
    # the straight-through custom_vjps (decoder.dense_int8 & co).  The
    # freeze is verified against the ACTUAL trainable mask (not just the
    # flag list); the float body is stashed on host for checkpoint export.
    float_body_stash = None
    if tcfg.student_body_quant and lora_cfg is None:
        import jax

        from llavamod_tpu.models.llm.decoder import quantize_decoder_int8
        from llavamod_tpu.train.optim import trainable_mask

        mask = trainable_mask(params, tcfg, None)
        bad = [jax.tree_util.keystr(kp)
               for kp, v in jax.tree_util.tree_leaves_with_path(
                   mask.get("llm", {}).get("layers", []))
               if v and "router" not in jax.tree_util.keystr(kp)]
        if bad:
            raise ValueError(
                "--policy_body_quant needs every decoder weight except the "
                f"router frozen via --train_modules; trainable: {bad[:4]}")
        float_body_stash = jax.tree_util.tree_map(
            np.asarray, params["llm"]["layers"])
        params = dict(params)
        params["llm"] = quantize_decoder_int8(params["llm"],
                                              include_experts=True)
        rank0_print("[build] student body quantized to int8 W8A8 (frozen "
                    "attn/MLP/experts; STE backward carries router grads; "
                    "float body stashed on host)")

    # Pre-stack the decoder layer trees (decoder.stack_layers): the layer
    # scan otherwise re-stacks ALL weights into an HLO temp on every step —
    # one full extra weight copy of HBM traffic (measured +5.3% step
    # throughput removed on v5e).  Skipped with LoRA (adapter target paths
    # are per-layer) and when the scan path is off.
    if (getattr(targs, "prestack_layers", True) and lora_cfg is None
            and cfg.llm.scan_layers):
        from llavamod_tpu.models.llm.decoder import stack_layers

        params = dict(params)
        params["llm"] = stack_layers(cfg.llm, params["llm"])
        if teacher_params is not None and teacher_cfg is not None:
            teacher_params = dict(teacher_params)
            teacher_params["llm"] = stack_layers(teacher_cfg.llm,
                                                 teacher_params["llm"])
        rank0_print("[build] layer trees pre-stacked for the scan path")

    # ---- state / step fn, under the (optional) mesh ----
    with _DeviceContext(targs) as dev:
        params = dev.shard_params(params)
        if teacher_params is not None:
            teacher_params = dev.shard_params(teacher_params)
        fused = bool(getattr(targs, "fused_update", False))
        if fused:
            if stage != "align":
                raise ValueError("--fused_update is align-stage only")
            if lora_cfg is not None:
                raise ValueError("--fused_update does not support LoRA")
            if tcfg.grad_accum_steps > 1:
                # in-batch accumulation: the loader folds the microbatches
                # into the batch axis and ONE program applies the
                # mean-of-microbatch-gradients update (fused_steps.py).
                # A fused "step" is one OPTIMIZER step consuming accum
                # microbatches, so the loop budget below is divided by
                # accum — the same CLI config then trains the same number
                # of updates over the same data on either path.
                rank0_print(f"[fused] in-batch gradient accumulation: "
                            f"{tcfg.grad_accum_steps} microbatches folded "
                            f"per update; running "
                            f"{max(1, total_steps // tcfg.grad_accum_steps)}"
                            f" update steps (= {total_steps} microbatches)")
            if targs.pipeline_parallel > 1:
                raise ValueError("--fused_update drives its own reverse "
                                 "layer scan and cannot run under "
                                 "--pipeline_parallel; drop one of the two")
            from llavamod_tpu.train.fused_steps import (
                init_fused_state,
                make_fused_align_step,
            )

            state = init_fused_state(params, cfg, tcfg)
        else:
            state = TrainState.create(params, tcfg, lora_cfg)
        state, resumed = maybe_auto_resume(targs.output_dir, state)
        if resumed:
            rank0_print(f"[ckpt] auto-resumed from {resumed}")
        start_step = int(state.step)

        if stage == "align":
            step_fn = (make_fused_align_step(cfg, teacher_cfg, tcfg)
                       if fused
                       else make_align_step(cfg, teacher_cfg, tcfg, lora_cfg))
            call = lambda st, b: step_fn(st, teacher_params,  # noqa: E731
                                         batch_from_arrays(b))
        elif stage == "dpo":
            step_fn = make_dpo_step(cfg, teacher_cfg, tcfg, lora_cfg)
            call = lambda st, b: step_fn(st, teacher_params, b)  # noqa: E731
        else:
            step_fn = make_pretrain_step(cfg, tcfg, lora_cfg)
            call = lambda st, b: step_fn(st, batch_from_arrays(b))  # noqa: E731

        # loop budget: total_steps is in MICROBATCHES (len(loader) x epochs,
        # or --max_steps).  The fused in-batch-accum path consumes accum
        # microbatches per call, so its call budget is total/accum — both
        # paths then see the same data and apply the same update count.
        loop_total = total_steps
        if fused and tcfg.grad_accum_steps > 1:
            loop_total = max(1, total_steps // tcfg.grad_accum_steps)
        logger = MetricLogger(targs, loop_total)
        os.makedirs(targs.output_dir, exist_ok=True)
        last_metrics: Dict[str, float] = {}
        step_no = start_step

        # preemption safety: SIGTERM triggers a checkpoint at the next step
        # boundary before exiting (TPU pods get preempted; the reference
        # relies on periodic HF Trainer saves only)
        stop_requested = []
        import signal

        def _on_term(signum, frame):
            rank0_print("[run] SIGTERM received; checkpointing then exiting")
            stop_requested.append(True)

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # non-main thread (tests)
            prev_handler = None

        from llavamod_tpu.runtime.prefetch import DevicePrefetcher
        from llavamod_tpu.train.loader import fold_microbatches, infinite_batches

        host_batches = infinite_batches(loader)
        if fused and tcfg.grad_accum_steps > 1:
            # image_pos re-offsetting needs the collator's media-table
            # stride (data/collator.py::_stack_spliced)
            rows = cfg.max_images * cfg.num_image_tokens + (
                cfg.num_video_tokens
                if cfg.video_projector_type is not None else 0)
            host_batches = fold_microbatches(host_batches,
                                             tcfg.grad_accum_steps,
                                             rows_per_sample=rows)
        batches = DevicePrefetcher(host_batches, mesh=dev.mesh)
        profiler_on = False
        for batch in batches:
            if step_no >= loop_total or stop_requested:
                break
            if targs.profile_steps and step_no == start_step + 1:
                import jax.profiler

                jax.profiler.start_trace(
                    os.path.join(targs.output_dir, "profile"))
                profiler_on = True
            state, metrics = call(state, batch)
            step_no += 1
            last_metrics = {k: float(v) for k, v in metrics.items()}
            logger.update(step_no, last_metrics)
            if profiler_on and step_no >= start_step + 1 + targs.profile_steps:
                import jax.profiler

                jax.profiler.stop_trace()
                profiler_on = False
                rank0_print(f"[run] wrote profile to "
                            f"{targs.output_dir}/profile")
            if stop_requested or (
                    targs.save_steps and step_no % targs.save_steps == 0
                    and step_no < loop_total):
                _save_periodic(targs.output_dir, step_no, state, targs, tcfg,
                               cfg, targs.save_total_limit)
        if profiler_on:
            import jax.profiler

            jax.profiler.stop_trace()
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)

        if float_head_stash is not None:
            # restore the frozen float head for export (the int8 copy was a
            # training-time stand-in; it never received updates)
            p = dict(state.params)
            p["llm"] = dict(p["llm"])
            p["llm"]["lm_head"] = {"weight": float_head_stash}
            state = state._replace(params=p)
        if float_body_stash is not None:
            # same for the int8 body — restore the float layers, but graft
            # the TRAINED routers back in from the live (possibly stacked)
            # tree, since the routers kept updating during training
            import jax
            import jax.numpy as jnp

            from llavamod_tpu.models.llm.decoder import unstack_layers

            p = dict(state.params)
            p["llm"] = dict(p["llm"])
            live = unstack_layers(cfg.llm, p["llm"])["layers"]
            layers = []
            for stash_l, live_l in zip(float_body_stash, live):
                out_l = jax.tree_util.tree_map(jnp.asarray, stash_l)
                if "router" in live_l.get("mlp", {}):
                    out_l["mlp"]["router"] = live_l["mlp"]["router"]
                layers.append(out_l)
            p["llm"]["layers"] = layers
            state = state._replace(params=p)
        final_save(targs.output_dir, cfg, state, lora_cfg, margs, tcfg)
    return last_metrics


def _maybe_init_multihost() -> None:
    """Join a multi-host TPU pod when the standard coordinator env vars are
    present (the deepspeed-launcher equivalent; on a pod slice GKE/Cloud TPU
    sets these).  Single-host runs are untouched."""
    import os as _os

    if not (_os.environ.get("JAX_COORDINATOR_ADDRESS")
            or _os.environ.get("COORDINATOR_ADDRESS")):
        return
    import jax

    try:
        jax.distributed.initialize()
        rank0_print(f"[mesh] multihost: process {jax.process_index()}"
                    f"/{jax.process_count()}")
    except Exception as exc:  # already initialized / single host
        rank0_print(f"[mesh] jax.distributed.initialize skipped: {exc}")


def load_tokenizer(margs: ModelArgs):
    import transformers

    path = margs.model_name_or_path
    # self-contained tiktoken families (qwen-1.0 / stablelm arcade100k):
    # the checkpoint's *.tiktoken vocab is enough, no trust_remote_code
    from llavamod_tpu.interop.tiktoken_tokenizers import load_tiktoken_tokenizer

    tok = load_tiktoken_tokenizer(path)
    if tok is not None:
        return tok
    tok = transformers.AutoTokenizer.from_pretrained(path)
    if tok.pad_token is None and tok.unk_token is not None:
        tok.pad_token = tok.unk_token  # reference pad fixups train.py:365-385
    return tok


def main(argv=None, stage: Optional[str] = None) -> None:
    args = list(sys.argv[1:] if argv is None else argv)
    # an explicit --stage always wins (e.g. `train.py --stage finetune`
    # for SFT/MoE-SFT, mirroring the reference's single train.py script)
    if "--stage" in args:
        i = args.index("--stage")
        stage = args[i + 1]
        del args[i:i + 2]
    if stage is None:
        stage = "pretrain"
    classes = [ModelArgs, DataArgs, TrainArgs]
    if stage == "align":
        classes.append(AlignArgs)
        margs, dargs, targs, salign = parse_into_dataclasses(classes, args)
        run_stage(stage, margs, dargs, targs, salign=salign)
    elif stage == "dpo":
        classes.append(DPOArgs)
        margs, dargs, targs, sdpo = parse_into_dataclasses(classes, args)
        run_stage(stage, margs, dargs, targs, sdpo=sdpo)
    else:
        margs, dargs, targs = parse_into_dataclasses(classes, args)
        run_stage(stage, margs, dargs, targs)


if __name__ == "__main__":
    main()
