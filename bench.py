"""Benchmark: mimic-distillation throughput on one TPU chip.

Measures the stage-2 hot loop (SURVEY.md §3.2 — the reference's dominant
workload): teacher forward + sparse-MoE student forward/backward + vocab-
chunked KD loss + optimizer update, all in ONE jitted step.

Prints ONE JSON line:
  {"metric": ..., "value": tokens/sec/chip, "unit": ..., "vs_baseline": ...}
vs_baseline = achieved model FLOPs utilization / 0.40 (the 40%-MFU north
star from BASELINE.md; the reference repo publishes no throughput numbers).

The default (headline) workload is BENCH_CONFIG=flagship — the config of
record on one v5e (16 GB): Qwen1.5-1.8B student upcycled to a 4-expert
top-2 MoE every 2nd layer (2.24B activated), int8-W8A8 7B-class teacher,
shared CLIP-ViT-L/336 tower, T=2048, bf16, fused KD+CE, and the RECORD
train set (all expert/dense FFNs + routers, 2.03B trainable) via
Adafactor + the fused backward+update step.  See main() for the other
configs; scale knobs via env: BENCH_BATCH, BENCH_SEQ, BENCH_STEPS, ...
(grep env( below).
"""

import functools
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _summarize_profile(profile_dir: str, top: int = 40, steps: int = 3):
    """Aggregate device-plane op durations from the newest trace dump."""
    import collections
    import glob

    import jax

    files = sorted(glob.glob(os.path.join(
        profile_dir, "**", "*.xplane.pb"), recursive=True))
    if not files:
        log("no xplane.pb produced; profiling unsupported on this backend")
        return
    data = jax.profiler.ProfileData.from_file(files[-1])
    totals = collections.Counter()
    line_totals = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                ns = ev.duration_ns
                line_totals[line.name] += ns
                # async '-start' spans measure DMA *pending* time (they
                # overlap compute); keep occupancy lines separate
                if "XLA Ops" in line.name:
                    totals[ev.name] += ns
    log(f"== device line totals over {steps} step(s) ({files[-1]})")
    for name, ns in line_totals.most_common(10):
        log(f"{ns / 1e6 / steps:9.3f} ms/step  line: {name[:90]}")
    log("== XLA Ops occupancy totals")
    for name, ns in totals.most_common(top):
        log(f"{ns / 1e6 / steps:9.3f} ms/step  {name[:110]}")


def main():
    """Dispatch on BENCH_CONFIG:
      flagship     — THE HEADLINE (default): the config of record,
                     INCLUDING its train set — record shapes
                     (1.8B->4-expert-top-2 MoE student = 3.06B params /
                     2.24B activated, int8-W8A8 7B-class teacher, T=2048,
                     fused KD+CE objective) with every FFN + router
                     trainable (2.03B params,
                     dense2sparse_distillation.sh:56).  Fits one 16 GB
                     v5e via Adafactor + int8 frozen tensors + the fused
                     backward+update step (train/fused_steps.py).
      flagship_fit — the round-2 headline: same shapes, router-only
                     train set, whole student body int8-W8A8 (the QAT
                     serving recipe); 4P_s+2P_t FLOPs accounting.
      default      — small-config datapoint: 0.5B-MoE student + 1.8B int8
                     teacher, T=1024 (the round-1 headline).
      eval         — batched cached generation (eval/generate.py path) vs
                     the reference's bs=1 use_cache=False algorithm
                     (model_vqa_loader.py:118-130) measured on this chip.
    """
    cfg_name = os.environ.get("BENCH_CONFIG", "flagship")
    if cfg_name == "eval":
        return bench_eval()
    if cfg_name == "pretrain":
        return bench_pretrain()
    if cfg_name == "dpo":
        return bench_dpo()
    return bench_distill(cfg_name)


def _matmul_param_split(cfg):
    """Activated matmul params by component: (attention, ffn, router, head).

    Embeddings/norms are excluded (gathers + elementwise, not MXU work);
    the split feeds the dtype-aware MFU denominator."""
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    h, kh = cfg.num_heads, cfg.num_kv_heads
    dh = cfg.head_dim or d // cfg.num_heads
    attn_l = d * h * dh + 2 * d * kh * dh + h * dh * d
    mlp_l = (3 if cfg.gated_mlp else 2) * d * f
    attn = cfg.num_layers * attn_l
    ffn = router = 0
    for i in range(cfg.num_layers):
        ffn += mlp_l
        if cfg.is_moe and i in cfg.moe_layers:
            ffn += (cfg.moe_top_k - 1) * mlp_l
            router += d * cfg.moe_num_experts
    return attn, ffn, router, v * d


def bench_pretrain():
    """Stage-1 (projector pretrain) datapoint — the recipe of record:
    Qwen2-0.5B + CLIP-ViT-L-336 + mlp2x_gelu, projector-only train set
    (tune_mm_mlp_adapter), B=8, T=2048, bf16
    (reference shells/train/qwen/pretrain.sh:25-57).

    The backward still runs dL/dx through the whole frozen LLM (the
    projector sits at the input), so the step is ~2 forwards of LLM
    compute + the tower; only the dW matmuls are elided (stop-grad DCE).
    """
    import jax
    import jax.numpy as jnp

    from llavamod_tpu.models import llava
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm import decoder
    from llavamod_tpu.models.llm.config import QWEN2_0_5B
    from llavamod_tpu.models.llm.upcycle import activated_params
    from llavamod_tpu.models.vision.vit import CLIP_VIT_L_336
    from llavamod_tpu.train.config import TrainConfig
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.steps import batch_from_arrays, make_pretrain_step

    b = int(os.environ.get("BENCH_BATCH", "8"))       # pretrain.sh:40
    t = int(os.environ.get("BENCH_SEQ", "2048"))      # model_max_length
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    # Default: chunked in-step grad accumulation (grad_row_chunks=B) with
    # remat OFF — per-row residuals (~3.7 GB) fit, so the ~2P full-remat
    # recompute disappears.  BENCH_ROW_CHUNKS=1 BENCH_REMAT=1 reproduces
    # the remat datapoint (B=8 x T=2048 un-rematerialized residuals are
    # 29.4 GB on a 15.75 GB chip — the one-shot step MUST remat).
    row_chunks = int(os.environ.get("BENCH_ROW_CHUNKS", str(b)))
    remat = os.environ.get(
        "BENCH_REMAT", "0" if row_chunks > 1 else "1") == "1"
    dtype = jnp.bfloat16

    llm = QWEN2_0_5B.replace(scan_layers=True)
    cfg = LlavaConfig(llm=llm, vision=CLIP_VIT_L_336,
                      projector_type="mlp2x_gelu", max_images=1)
    log(f"devices: {jax.devices()}")
    log(f"pretrain bench: qwen2-0.5b + CLIP-L-336, B={b} T={t} "
        f"projector-only, row_chunks={row_chunks} remat={remat}")
    params = llava.init(cfg, jax.random.PRNGKey(0), dtype=dtype)
    params["llm"] = decoder.stack_layers(cfg.llm, params["llm"])

    tcfg = TrainConfig(stage="pretrain", tune_mm_mlp_adapter=True,
                       optimizer="adamw", learning_rate=1e-3,
                       warmup_ratio=0.03, lr_schedule="cosine",
                       compute_dtype="bfloat16", remat=remat,
                       grad_row_chunks=row_chunks,
                       # sweep (round-5): 8192 > 2048/16384/38400 on this
                       # config — the row-chunked CE amortizes the scan's
                       # fixed overhead over bigger [2048, C] chunk matmuls
                       vocab_chunk=int(os.environ.get("BENCH_CHUNK", "8192")),
                       total_steps=10_000, max_grad_norm=1.0)
    state = TrainState.create(params, tcfg)
    step = make_pretrain_step(cfg, tcfg)

    n_img = cfg.num_image_tokens
    ids = np.random.randint(10, 1000, size=(b, t)).astype(np.int32)
    image_mask = np.zeros((b, t), bool)
    image_mask[:, 1:1 + n_img] = True
    image_pos = np.zeros((b, t), np.int32)
    for i in range(b):
        image_pos[i, 1:1 + n_img] = i * n_img + np.arange(n_img)
    labels = np.where(image_mask, -100, ids)
    labels[:, : t // 8] = -100
    s = cfg.vision.image_size
    batch = batch_from_arrays({
        "input_ids": ids, "segment_ids": np.ones((b, t), np.int32),
        "image_mask": image_mask, "image_pos": image_pos,
        "pixels": np.random.randn(b, 1, 3, s, s).astype(np.float32),
        "pixel_valid": np.ones((b, 1), bool), "labels": labels})

    log("compiling the pretrain step (first call)...")
    t0 = time.time()
    state, metrics = step(state, batch)
    log(f"compile+first step: {time.time() - t0:.1f}s  "
        f"loss={float(metrics['loss']):.4f}")
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # fetch forces execution on the remote backend
    elapsed = time.time() - t0

    tok = b * t
    tok_per_sec = tok * steps / elapsed
    p_llm = activated_params(cfg.llm)
    p_v = 0.30e9
    # frozen LLM: fwd + dL/dx only (dW DCE'd); frozen tower fwd; the
    # trainable projector's own matmuls are <0.1% and ignored
    flops_per_step = 4 * p_llm * tok + 2 * p_v * 577 * b
    mfu = flops_per_step * steps / elapsed / 197e12
    log(f"elapsed {elapsed:.2f}s for {steps} steps; "
        f"{tok_per_sec:.0f} tok/s/chip; MFU={mfu:.3f} (all-bf16)")
    print(json.dumps({
        "metric": "pretrain_tokens_per_sec_per_chip",
        "value": round(tok_per_sec, 1),
        "unit": f"tokens/s/chip (stage-1 projector-only, qwen2-0.5b + "
                f"CLIP-L-336, B={b}, T={t}, bf16)",
        "vs_baseline": round(mfu / 0.40, 3),
        "mfu_bf16_peak": round(mfu, 3),
        "mfu_dtype_aware": round(mfu, 3),
    }))


def bench_dpo():
    """Stage-3 (preference distillation) datapoint — flagship shapes:
    1.8B->4-expert-top-2 MoE policy (record FFN+router train set,
    adafactor), dense 1.8B int8-W8A8 reference model, kto_pair, B=1,
    T=2048 (reference shells/train/qwen/preference_distillation.sh).

    Our step runs TWO forwards (policy on [chosen;rejected] stacked, ref
    likewise, sharing one tower encode) vs the reference's FOUR separate
    model calls (dpo_trainer.py:596-609).  tokens/s counts the 2*B*T
    sequence tokens processed per step (both preference sides).
    """
    import jax
    import jax.numpy as jnp

    from llavamod_tpu.models import llava
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm import decoder
    from llavamod_tpu.models.llm.config import QWEN1_5_1_8B
    from llavamod_tpu.models.llm.upcycle import activated_params, upcycle
    from llavamod_tpu.models.vision.vit import CLIP_VIT_L_336
    from llavamod_tpu.train.config import TrainConfig
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.steps import make_dpo_step

    b = int(os.environ.get("BENCH_BATCH", "1"))   # preference_*.sh
    t = int(os.environ.get("BENCH_SEQ", "2048"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    ref_quant = os.environ.get("BENCH_REF_QUANT", "int8_head")
    dtype = jnp.bfloat16
    vis_cfg = CLIP_VIT_L_336

    log(f"devices: {jax.devices()}")
    remat_policy = os.environ.get("BENCH_REMAT_POLICY", "none")
    log(f"dpo bench: 1.8b-MoE policy vs dense 1.8b ref "
        f"({ref_quant or 'bf16'}), B={b} T={t} kto_pair remat={remat} "
        f"policy={remat_policy}")
    base = QWEN1_5_1_8B.replace(scan_layers=True, remat_policy=remat_policy)
    pol_cfg = LlavaConfig(llm=base, vision=vis_cfg,
                          projector_type="mlp2x_gelu", max_images=1)
    params = llava.init(pol_cfg, jax.random.PRNGKey(0), dtype=dtype)
    moe_cfg, moe_params = upcycle(pol_cfg.llm, params["llm"],
                                  moe_mode="sparse", num_experts=4, top_k=2,
                                  capacity_factor=1.5,
                                  eval_capacity_factor=2.0)
    pol_cfg = pol_cfg.replace(llm=moe_cfg.replace(moe_gating_group_size=1024))
    # the record train set (FFN + router) freezes policy attention, LM head
    # and embedding — the same int8-W8A8 trick as the flagship align bench
    # applies: frozen halves on the int8 MXU, STE dL/dx, trainable FFNs
    # stay bf16.  BENCH_POLICY_ATTN_QUANT=0 restores the all-bf16 policy.
    pol_attn_quant = os.environ.get("BENCH_POLICY_ATTN_QUANT", "1") == "1"
    if pol_attn_quant:
        moe_params = decoder.quantize_decoder_int8(
            moe_params, include_mlp=False, include_experts=False,
            include_lm_head=True, include_embed=True)
        log("policy attention/head/embed quantized to int8 W8A8 (frozen "
            "in the record train set; trainable FFNs stay bf16)")
    params["llm"] = decoder.stack_layers(pol_cfg.llm, moe_params)
    del moe_params

    ref_cfg = LlavaConfig(llm=base, vision=vis_cfg,
                          projector_type="mlp2x_gelu", max_images=1)
    ref_params = llava.init(ref_cfg, jax.random.PRNGKey(1), dtype=dtype,
                            vision_params=params["vision"])
    ref_params = {k: v for k, v in ref_params.items() if k != "vision"}
    if ref_quant in ("int8", "int8_head"):
        ref_params["llm"] = decoder.quantize_decoder_int8(
            ref_params["llm"], include_lm_head=(ref_quant == "int8_head"))
        log("frozen reference model quantized to int8 W8A8"
            + (" + int8 LM head" if ref_quant == "int8_head" else ""))
    ref_params["llm"] = decoder.stack_layers(ref_cfg.llm, ref_params["llm"])

    # recipe of record: kto_pair, the d2s train set carried into stage 3
    # (moe_finetune); adafactor — the 2.03B train set's Adam state cannot
    # fit next to two 1.8B-class models on one v5e
    tcfg = TrainConfig(stage="dpo", dpo_loss_type="kto_pair", dpo_beta=0.1,
                       optimizer="adafactor", learning_rate=2e-6,
                       train_modules=("/gate", "/up", "/down", "router"),
                       moe_loss_enable=True, compute_dtype="bfloat16",
                       remat=remat,
                       vocab_chunk=int(os.environ.get("BENCH_CHUNK", "4096")),
                       total_steps=10_000, max_grad_norm=0.0)
    state = TrainState.create(params, tcfg)
    step = make_dpo_step(pol_cfg, ref_cfg, tcfg)

    n_img = pol_cfg.num_image_tokens
    rng = np.random.RandomState(0)

    def side(prefix):
        ids = rng.randint(10, 1000, size=(b, t)).astype(np.int32)
        mask = np.zeros((b, t), bool)
        mask[:, 1:1 + n_img] = True
        pos = np.zeros((b, t), np.int32)
        for i in range(b):
            pos[i, 1:1 + n_img] = i * n_img + np.arange(n_img)
        labels = np.where(mask, -100, ids)
        labels[:, : t // 4] = -100
        return {prefix + "input_ids": ids,
                prefix + "segment_ids": np.ones((b, t), np.int32),
                prefix + "image_mask": mask, prefix + "image_pos": pos,
                prefix + "labels": labels}

    s = vis_cfg.image_size
    batch = {**side("chosen_"), **side("rejected_"),
             "pixels": rng.randn(b, 1, 3, s, s).astype(np.float32),
             "pixel_valid": np.ones((b, 1), bool)}

    log("compiling the dpo step (first call)...")
    t0 = time.time()
    state, metrics = step(state, ref_params, batch)
    log(f"compile+first step: {time.time() - t0:.1f}s  "
        f"loss={float(metrics['loss']):.4f}")
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, ref_params, batch)
    float(metrics["loss"])  # fetch forces execution on the remote backend
    elapsed = time.time() - t0

    tok2 = 2 * b * t  # chosen + rejected rows per step
    tok_per_sec = tok2 * steps / elapsed
    p_pol = activated_params(pol_cfg.llm)
    p_ref = activated_params(ref_cfg.llm)
    p_v = 0.30e9
    # policy fwd + dx + dW(FFN+router trainable) ~= 6P; ref fwd = 2P;
    # one shared tower encode of the b images
    flops_per_step = (6 * p_pol + 2 * p_ref) * tok2 + 2 * p_v * 577 * b
    mfu = flops_per_step * steps / elapsed / 197e12
    # dtype-aware: ref matmuls (attn+ffn+head at int8) against the 394
    # TF/s int8 peak, everything else bf16
    a_r, f_r, r_r, h_r = _matmul_param_split(ref_cfg.llm)
    a_p, f_p, r_p, h_p = _matmul_param_split(pol_cfg.llm)
    fi = fb = 0.0
    if ref_quant == "int8_head":
        fi += 2 * (a_r + f_r + h_r) * tok2
    elif ref_quant == "int8":
        fi += 2 * (a_r + f_r) * tok2
        fb += 2 * h_r * tok2
    else:
        fb += 2 * (a_r + f_r + h_r) * tok2
    fb += (6 * (f_p + r_p)) * tok2
    if pol_attn_quant:
        # frozen policy attention fwd + STE dx on the int8 MXU; int8 head
        # fwd int8, but its dh backward runs on the dequantized bf16 chunk
        # (ops/losses._lse_gather_bwd)
        fi += (4 * a_p + 2 * h_p) * tok2
        fb += 2 * h_p * tok2
    else:
        fb += (4 * a_p + 4 * h_p) * tok2
    fb += 2 * p_v * 577 * b
    mfu_dtype = (fi / 394e12 + fb / 197e12) * steps / elapsed
    log(f"elapsed {elapsed:.2f}s for {steps} steps; "
        f"{tok_per_sec:.0f} tok/s/chip (2 sides); MFU={mfu:.3f} bf16-peak, "
        f"{mfu_dtype:.3f} dtype-aware")
    print(json.dumps({
        "metric": "dpo_tokens_per_sec_per_chip",
        "value": round(tok_per_sec, 1),
        "unit": f"tokens/s/chip (kto_pair, 1.8b-MoE policy record train "
                f"set + adafactor"
                + (", int8 frozen attn/head" if pol_attn_quant else "")
                + ", dense 1.8b ref"
                + (" int8-W8A8" if ref_quant.startswith("int8") else "")
                + f", B={b}, T={t}, 2-forward step)",
        "vs_baseline": round(mfu_dtype / 0.40, 3),
        "vs_baseline_bf16_peak": round(mfu / 0.40, 3),
        "mfu_bf16_peak": round(mfu, 3),
        "mfu_dtype_aware": round(mfu_dtype, 3),
    }))


def bench_distill(cfg_name: str = "default"):
    import jax
    import jax.numpy as jnp

    from llavamod_tpu.models import llava
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm import decoder
    from llavamod_tpu.models.llm.config import (QWEN1_5_0_5B, QWEN1_5_1_8B,
                                                QWEN1_5_4B, QWEN1_5_7B)
    from llavamod_tpu.models.llm.upcycle import activated_params, upcycle
    from llavamod_tpu.models.vision.vit import CLIP_VIT_L_336
    from llavamod_tpu.train.config import TrainConfig
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.steps import batch_from_arrays, make_align_step

    # Per-config defaults; any BENCH_* env still overrides.
    if cfg_name in ("flagship", "flagship_fit"):
        # Config of record (BASELINE.json / docs/TRAIN_EVAL.md:3-6,37-45):
        # Qwen1.5-1.8B student upcycled to 4-expert top-2 every-2nd-layer
        # (~2.2B activated), 7B-class teacher, max_len 2048, fused KD+CE
        # (kd_lm, dense2sparse_distillation.sh).  Swept at these shapes:
        # B=1+full-remat > B=2 (0.653) > remat_policy=moe (0.617); chunk
        # flat 2048-8192; gating group 1024 > 512 ~ 2048 (BENCH_NOTES).
        # remat: with the int8 student body (round-6), FULL remat stopped
        # paying — MoE-block-only remat (remat_policy=moe, remat off) fits
        # the freed HBM and wins 6 375 -> 6 442; flash blocks 1024x1024 at
        # the T=2048 shapes add the rest -> 6 603 tok/s (MFU 0.830).
        defaults = dict(BENCH_BATCH="1", BENCH_SEQ="2048", BENCH_STEPS="20",
                        BENCH_STUDENT="1.8b", BENCH_TEACHER="7b",
                        BENCH_REMAT="0", BENCH_EMBED_QUANT="1",
                        BENCH_REMAT_POLICY="moe",
                        BENCH_MOE_GROUP="1024", BENCH_LOSS="kd_lm")
        os.environ.setdefault("LLAVAMOD_FLASH_BLOCK_Q", "1024")
        os.environ.setdefault("LLAVAMOD_FLASH_BLOCK_K", "1024")
        if cfg_name == "flagship_fit":
            # record train set (all FFN + router) needs ~8.1 GB adam state
            # + 4.1 GB grads on top of 14.5 GB params — router-only is the
            # largest trainable set that leaves the record shapes intact.
            # With everything but the router frozen, the whole student body
            # runs int8-W8A8 by default too (+18%, first-step KD-loss delta
            # 0.0168 on 24.83 ≈ 7e-4 relative; BENCH_STUDENT_BODY_QUANT=0
            # for the bf16 body)
            defaults["BENCH_TRAIN_MODULES"] = "router"
            defaults["BENCH_STUDENT_BODY_QUANT"] = "1"
            # same streamed STE dh as the flagship default (the whole body
            # is already straight-through here)
            defaults["BENCH_INT8_DH"] = "1"
            defaults["BENCH_STREAM_DH"] = "1"
        else:
            # flagship = the RECORD train set (every FFN + router, 2.03B
            # trainable — dense2sparse_distillation.sh:56).  Fitting it on
            # one 16 GB v5e needs (a) Adafactor: factored second moment,
            # ~2 MB of state instead of 8.1 GB bf16 Adam m+v; (b) int8 for
            # every FROZEN student tensor (attention projections, embed,
            # head) while the trainable FFNs stay bf16; (c) full remat +
            # B=1 to keep activations out of the grad buffer's way.
            # (d) the fused backward+update step: Adafactor applied
            # per-repeat INSIDE the backward scan, so the 4.06 GB full
            # gradient tree never materializes (train/fused_steps.py)
            defaults["BENCH_TRAIN_MODULES"] = "record"
            defaults["BENCH_OPT"] = "adafactor"
            defaults["BENCH_STUDENT_ATTN_QUANT"] = "1"
            # the frozen int8 head's dL/dhidden joins the attention dx in
            # the straight-through family: accumulators streamed through
            # the loss forward (backward never re-touches the heads) on
            # the int8 MXU.  4,967 -> 5,013 tok/s measured; BENCH_INT8_DH=0
            # BENCH_STREAM_DH=0 restores the exact dequantized-bf16 dh.
            defaults["BENCH_INT8_DH"] = "1"
            defaults["BENCH_STREAM_DH"] = "1"
            defaults["BENCH_FUSED"] = "1"
            defaults["BENCH_REMAT"] = "0"
            defaults["BENCH_REMAT_POLICY"] = "none"
            # ... and (e) the recipe's gradient_accumulation_steps 8
            # (dense2sparse_distillation.sh:72), folded into the batch
            # axis with a per-microbatch sequential backward
            # (fused_steps.py) — the COMPLETE record recipe on one chip:
            # 4 572 tok/s vs 4 904 without accumulation (BENCH_ACCUM=1)
            defaults["BENCH_ACCUM"] = "8"
            # the accum=8 fold amortizes the loss lax.map's fixed
            # overhead over 8x the rows: 4096 > 2048 HERE (4 837 vs
            # 4 827), unlike every accum=1 config (sweep below)
            defaults["BENCH_CHUNK"] = "4096"
    else:
        defaults = {}
    env = lambda k, d: os.environ.get(k, defaults.get(k, d))

    # B=2 with remat OFF is the measured sweet spot (0.514 MFU): the int8
    # teacher + 2048-chunk loss freed enough HBM that the student's full
    # backward recompute is no longer worth it.  B=3 remat-off trips an XLA
    # scoped-vmem limit in the embedding gather; B=4 needs remat (0.504).
    b = int(env("BENCH_BATCH", "2"))
    t = int(env("BENCH_SEQ", "1024"))
    steps = int(env("BENCH_STEPS", "30"))  # 30 amortizes the
    # post-compile warmup on the remote backend (10 steps underreports ~2%)
    # bisection knobs (defaults = the full headline workload)
    attn = os.environ.get("BENCH_ATTN", "auto")          # auto|flash|xla
    remat = env("BENCH_REMAT", "0") == "1"
    use_moe = os.environ.get("BENCH_MOE", "1") == "1"
    student_size = env("BENCH_STUDENT", "0.5b")          # 0.5b|1.8b
    teacher_size = env("BENCH_TEACHER", "1.8b")  # 0.5b|1.8b|4b|7b
    train_set = env("BENCH_TRAIN_MODULES", "record")     # record|router
    scan = os.environ.get("BENCH_SCAN", "1") == "1"
    # vocab-chunk sweep on this workload: 2048 ~ 1024 (0.504 MFU) > 4096
    # (0.498) > 8192 (0.494) > 16k/32k (0.489) — smaller chunks keep the
    # [N, C] fp32 intermediates resident in VMEM between the two head
    # matmuls and the streaming stats.  The accum=8 flagship fold flips
    # this: 4096 > 2048 there (per-config default; BENCH_NOTES round-8)
    chunk = int(env("BENCH_CHUNK", "2048"))
    # per-sequence gating groups by default: linear-cost dispatch einsums
    # and DeepSpeed per-rank-batch parity (the reference gates per GPU with
    # per-GPU batch 1, dense2sparse_distillation.sh)
    moe_group = int(env("BENCH_MOE_GROUP", str(t)))
    remat_policy = env("BENCH_REMAT_POLICY", "none")
    loss_type = env("BENCH_LOSS", "only_kd")  # only_kd|kd_lm
    # W8A8 teacher by default, INCLUDING its LM head: attention/MLP and the
    # [151936, 2048] head matmuls (streamed twice per step by the chunked KD
    # loss — fwd + bwd recompute) run on the int8 MXU (2x bf16 peak).
    # Measured KD-loss delta vs the bf16 teacher is ~4e-4 (inside the 1e-3
    # parity budget; the head adds nothing measurable on top of the body).
    # BENCH_TEACHER_QUANT=int8 for body-only, empty for the bf16 teacher.
    teacher_quant = os.environ.get("BENCH_TEACHER_QUANT", "int8_head")
    opt_name = env("BENCH_OPT", "adamw")  # adamw | adafactor
    dtype = jnp.bfloat16

    log(f"devices: {jax.devices()}")
    log(f"bench config: B={b} T={t} steps={steps}")

    key = jax.random.PRNGKey(0)
    vis_cfg = CLIP_VIT_L_336

    unroll = int(os.environ.get("BENCH_SCAN_UNROLL", "1"))
    student_presets = {"0.5b": QWEN1_5_0_5B, "1.8b": QWEN1_5_1_8B}
    teacher_presets = {"0.5b": QWEN1_5_0_5B, "1.8b": QWEN1_5_1_8B,
                       "4b": QWEN1_5_4B, "7b": QWEN1_5_7B}
    student_llm = student_presets[student_size].replace(
        scan_layers=scan, remat_policy=remat_policy, scan_unroll=unroll)
    teacher_llm = teacher_presets[teacher_size].replace(scan_layers=scan,
                                                        scan_unroll=unroll)
    student_llava = LlavaConfig(llm=student_llm, vision=vis_cfg,
                                projector_type="mlp2x_gelu", max_images=1)
    teacher_llava = LlavaConfig(llm=teacher_llm, vision=vis_cfg,
                                projector_type="mlp2x_gelu", max_images=1)

    log("initializing params (bf16)...")
    k1, k2, k3 = jax.random.split(key, 3)
    import llavamod_tpu.models.vision.vit as vit

    # NOTE on build placement: arrays built on the HOST and device_put make
    # the step 6x slower (XLA compiles host-layout parameters and converts
    # per call — measured 14,330 -> 2,510 tok/s on the default config) and
    # the per-call converted copies blow HBM for flagship shapes.  So ALL
    # trees are built ON DEVICE.  HBM-peak discipline for flagship shapes
    # (13.8 GB of params on a 15.75 GB chip):
    #   * the student is fully built (upcycle, quant, prestack) BEFORE the
    #     big teacher materializes;
    #   * temporaries are del'd as soon as their tree is final — a stray
    #     name keeping the pre-stack layer list alive is ~5 GB dead;
    #   * the big teacher is written layer-by-layer INTO a donated
    #     pre-stacked int8 buffer (peak = final tree + ONE bf16 layer),
    #     never as a whole bf16 tree (15.4 GB) or an unstacked list.
    vision_params = vit.init(vis_cfg, k3, dtype=dtype)
    student_params = llava.init(student_llava, k1, dtype=dtype,
                                vision_params=vision_params)
    del vision_params  # shared tree lives on inside student_params
    big_teacher = teacher_size in ("4b", "7b")
    embed_q = env("BENCH_EMBED_QUANT", "0") == "1"

    if use_moe:
        moe_llm_cfg, moe_llm_params = upcycle(
            student_llava.llm, student_params["llm"], moe_mode="sparse",
            num_experts=4, top_k=2, capacity_factor=1.5,
            eval_capacity_factor=2.0)
        if moe_group:
            moe_llm_cfg = moe_llm_cfg.replace(moe_gating_group_size=moe_group)
        student_llava = student_llava.replace(llm=moe_llm_cfg)
        student_params["llm"] = moe_llm_params
        del moe_llm_params  # alias would pin the pre-stack tree post-stack

    # recipe of record: FFN (experts) + router train, rest frozen
    # (dense2sparse_distillation.sh:56 --train_modules ... wg); frozen
    # params are stop-gradient'd so their backward is DCE'd and carry no
    # optimizer state.  'router' trains only the gate (flagship_fit: the
    # record FFN train set's optimizer state alone exceeds one v5e's HBM).
    train_modules = (("router",) if train_set == "router"
                     else ("/gate", "/up", "/down", "router"))
    tcfg = TrainConfig(stage="align", align_loss_type=loss_type,
                       compute_dtype="bfloat16", remat=remat,
                       kd_vocab_limit=151936, vocab_chunk=chunk,
                       attn_impl=attn, optimizer=opt_name,
                       train_modules=train_modules,
                       fused_remat=env("BENCH_FUSED_REMAT", "repeat"),
                       fused_teacher_chunks=int(
                           env("BENCH_TEACHER_CHUNKS", "-1")),
                       fused_bwd_microbatches=int(
                           env("BENCH_BWD_MB", "-1")),
                       fused_fwd_chunks=int(env("BENCH_FWD_CHUNKS", "-1")),
                       grad_accum_steps=int(env("BENCH_ACCUM", "1")),
                       kd_int8_dh=env("BENCH_INT8_DH", "0") == "1",
                       kd_stream_dh=env("BENCH_STREAM_DH", "0") == "1",
                       total_steps=10_000, max_grad_norm=1.0)
    accum = tcfg.grad_accum_steps
    if accum > 1:
        # recipe of record: per_device_train_batch_size 1 x
        # gradient_accumulation_steps 8 (dense2sparse_distillation.sh:70-72).
        # The fused step folds the microbatches into the batch axis with
        # per-microbatch loss normalization (train/fused_steps.py), so the
        # bench builds the folded [accum*B, T] batch directly.
        assert env("BENCH_FUSED", "0") == "1", (
            "BENCH_ACCUM>1 is the fused step's in-batch accumulation; "
            "set BENCH_FUSED=1 (the unfused path would need MultiSteps)")
        log(f"in-batch gradient accumulation: {accum} microbatches of "
            f"B={b} folded per optimizer step")

    prestack = os.environ.get("BENCH_PRESTACK", "1") == "1" and scan
    # int8 embedding tables (frozen in every recipe here): halves the
    # [151936, D] tables' HBM (0.62 GB each at D=2048/4096) — part of the
    # flagship_fit margin; dequantized on gather (decoder.embed)
    embed_quant = embed_q
    if embed_quant:
        w_e = student_params["llm"]["embed"]["embedding"]
        student_params["llm"] = dict(student_params["llm"])
        student_params["llm"]["embed"] = {"embedding": {
            **decoder.quantize_head_int8(w_e),
            "dtype_ref": jnp.zeros((0,), w_e.dtype)}}
        del w_e
        log("student embedding table quantized to int8 (frozen in recipe)")

    # int8 student LM head (W8A8 on the student side of the KD loss),
    # default ON: the bench workload IS the frozen-head recipe of record
    # (train_modules = FFN + router), and the measured loss delta is 1e-4.
    # Backward through the quantized logits is the standard straight-through
    # estimate.  BENCH_STUDENT_HEAD_QUANT=0 for the bf16 student head.
    if os.environ.get("BENCH_STUDENT_HEAD_QUANT", "1") == "1":
        tcfg = tcfg.replace(student_head_quant=True)
        # Pre-quantize OUTSIDE the step: the head is frozen in this recipe,
        # so per-step quantization recomputes the identical int8 copy every
        # call — a [V, D] elementwise pass plus a 0.31 GB HLO temp that was
        # part of the flagship_fit OOM margin.  _student_forward sees the
        # dict and skips the live quantization path.
        if "lm_head" in student_params["llm"]:
            student_params["llm"] = dict(student_params["llm"])
            student_params["llm"]["lm_head"] = {
                "weight": decoder.quantize_head_int8(
                    student_params["llm"]["lm_head"]["weight"])}
            log("student LM head pre-quantized to int8 (frozen-head recipe)")
        else:
            log("student LM head quantized to int8 per-step (tied embeddings)")

    # int8-W8A8 STUDENT BODY (attention + dense MLP + experts; the router
    # stays float): valid only when everything but the router is frozen —
    # the router-only flagship_fit train set.  Forward numerics = the W8A8
    # serving path; the router gradient flows through the quantized matmuls
    # via straight-through custom_vjps (decoder.dense_int8 & co), whose
    # backward dL/dx = g @ W_deq^T itself runs on the int8 MXU.
    body_quant = env("BENCH_STUDENT_BODY_QUANT", "0") == "1"
    if body_quant:
        assert train_set == "router", (
            "BENCH_STUDENT_BODY_QUANT requires the router-only train set "
            "(every quantized weight must be frozen)")
        student_params["llm"] = decoder.quantize_decoder_int8(
            student_params["llm"], include_experts=True)
        log("student body quantized to int8 W8A8 (frozen attn/MLP/experts; "
            "STE backward carries the router grads)")

    # int8-W8A8 student ATTENTION only (the record train set's frozen
    # half): dense2sparse_distillation.sh trains every FFN + router while
    # attention stays frozen — so wq/wk/wv/wo join the int8 MXU (and drop
    # half their HBM bytes) while the trainable FFNs/experts stay bf16.
    # FFN gradients flow through the quantized attention via the
    # straight-through custom_vjps (dense_int8 backward = g @ W_deq^T).
    attn_quant = env("BENCH_STUDENT_ATTN_QUANT", "0") == "1"
    if attn_quant:
        assert not body_quant, "body quant already covers attention"
        student_params["llm"] = decoder.quantize_decoder_int8(
            student_params["llm"], include_mlp=False, include_experts=False)
        log("student attention quantized to int8 W8A8 (frozen in the "
            "record train set; trainable FFNs stay bf16)")

    # Pre-stack layer trees outside the step: without this the jitted
    # step's layer scan re-stacks ALL weights into an HLO temp every call —
    # an extra full weight copy per step (fatal 8.4 GB peak for the int8 7B
    # teacher: flagship_fit OOM'd at 24.99G/15.75G before this).  The
    # student is stacked BEFORE the teacher exists: the stack's transient
    # (old + new tree) is the setup's HBM high-water mark.
    if prestack:
        student_params["llm"] = decoder.stack_layers(
            student_llava.llm, student_params["llm"])
        jax.block_until_ready(jax.tree_util.tree_leaves(student_params)[0])

    if big_teacher:
        # A 7B-class teacher in bf16 (15.4 GB) would OOM the chip if
        # initialized whole; an unstacked int8 layer list (then re-stacked)
        # would transiently double it.  Instead each layer is initialized +
        # quantized on device and written straight into a DONATED
        # pre-stacked int8 buffer: peak = final tree + one bf16 layer.
        log(f"initializing the {teacher_size} teacher on device, "
            f"layer-by-layer int8 into the stacked buffer...")
        assert decoder._layer_period(teacher_llm) == 1

        def _q_layer(lk):
            # same fused layout quantize_decoder_int8(fuse=True) emits:
            # wq|wk|wv -> one 'wqkv' matmul, gate|up -> one 'gate_up'
            lp = decoder.init_layer(teacher_llm, lk, dtype=dtype)
            attn = {k: v for k, v in lp["attn"].items()
                    if k not in ("wq", "wk", "wv", "wo")}
            attn["wqkv"] = decoder.quantize_dense_int8(jnp.concatenate(
                [lp["attn"]["wq"], lp["attn"]["wk"], lp["attn"]["wv"]],
                axis=1))
            attn["wo"] = decoder.quantize_dense_int8(lp["attn"]["wo"])
            mlp = {k: v for k, v in lp["mlp"].items()
                   if k not in ("gate", "up", "down")}
            mlp["gate_up"] = decoder.quantize_dense_int8(jnp.concatenate(
                [lp["mlp"]["gate"], lp["mlp"]["up"]], axis=1))
            mlp["down"] = decoder.quantize_dense_int8(lp["mlp"]["down"])
            return {**lp, "attn": attn, "mlp": mlp}

        tk = jax.random.split(k2, teacher_llm.num_layers + 3)
        lshape = jax.eval_shape(_q_layer, tk[1])
        stacked = jax.tree_util.tree_map(
            lambda sh: jnp.zeros((teacher_llm.num_layers,) + sh.shape,
                                 sh.dtype), lshape)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _fill(buf, lk, i):
            return jax.tree_util.tree_map(
                lambda b_, leaf: jax.lax.dynamic_update_index_in_dim(
                    b_, leaf, i, 0), buf, _q_layer(lk))

        for i in range(teacher_llm.num_layers):
            stacked = _fill(stacked, tk[i + 1], jnp.int32(i))
        jax.block_until_ready(jax.tree_util.tree_leaves(stacked)[0])

        @jax.jit
        def _q_head(hk):
            w = (jax.random.normal(
                hk, (teacher_llm.vocab_size, teacher_llm.hidden_size),
                jnp.float32) * 0.02)
            head = decoder.quantize_head_int8(w)
            if embed_q:
                emb = {**decoder.quantize_head_int8(w),
                       "dtype_ref": jnp.zeros((0,), dtype)}
            else:
                emb = w.astype(dtype)
            return head, emb

        t_head, t_embed = _q_head(tk[0])
        proj = teacher_llava.build_projector()
        teacher_params = {
            "llm": {
                "embed": {"embedding": t_embed},
                "layers": ({"stacked": [stacked]} if prestack
                           else decoder.unstack_layers(
                               teacher_llm,
                               {"layers": {"stacked": [stacked]}})["layers"]),
                "final_norm": {"weight": jnp.ones(
                    (teacher_llm.hidden_size,), dtype)},
                "lm_head": {"weight": t_head},
            },
            "projector": proj.init(tk[-1], dtype=dtype),
        }
        del stacked, t_head, t_embed
        log("int8 teacher built on device (stacked)")
    else:
        teacher_params = llava.init(teacher_llava, k2, dtype=dtype,
                                    vision_params=student_params["vision"])
        # shared frozen tower: the teacher tree drops its vision copy
        teacher_params = {k: v for k, v in teacher_params.items()
                          if k != "vision"}
        if teacher_quant in ("int8", "int8_head"):
            teacher_params["llm"] = decoder.quantize_decoder_int8(
                teacher_params["llm"],
                include_lm_head=(teacher_quant == "int8_head"),
                include_embed=embed_quant)
            log(f"teacher attention/MLP weights quantized to int8"
                + (" + int8 LM head" if teacher_quant == "int8_head" else "")
                + (" + int8 embed" if embed_quant else ""))
        if prestack:
            teacher_params["llm"] = decoder.stack_layers(
                teacher_llava.llm, teacher_params["llm"])
    if prestack:
        log("layer trees pre-stacked for the scan (no per-step restack)")
    log(f"knobs: attn={attn} remat={remat} moe={use_moe} "
        f"teacher={teacher_size} scan={scan} chunk={chunk}")

    fused = env("BENCH_FUSED", "0") == "1"
    if fused:
        from llavamod_tpu.train.fused_steps import (init_fused_state,
                                                    make_fused_align_step)

        assert prestack, "the fused backward needs pre-stacked layers"
        state = init_fused_state(student_params, student_llava, tcfg)
        step = make_fused_align_step(student_llava, teacher_llava, tcfg)
        log("fused backward+update step (per-repeat adafactor in the "
            "backward scan; no full-gradient-tree buffer)")
    else:
        state = TrainState.create(student_params, tcfg)
        step = make_align_step(student_llava, teacher_llava, tcfg)

    # synthetic batch: 1 image (576 slots) + text, full 1024-token sequences.
    # With in-batch accumulation the folded batch IS accum identical-shape
    # microbatches stacked on axis 0 (every row's image_pos = row * n_img —
    # exactly what train/loader.py::fold_microbatches would produce), so
    # build it at the folded size; all downstream token/FLOP accounting
    # uses the folded total.
    b = b * accum
    n_img = student_llava.num_image_tokens
    ids = np.random.randint(10, 1000, size=(b, t)).astype(np.int32)
    image_mask = np.zeros((b, t), bool)
    image_mask[:, 1:1 + n_img] = True
    image_pos = np.zeros((b, t), np.int32)
    for i in range(b):
        image_pos[i, 1:1 + n_img] = i * n_img + np.arange(n_img)
    labels = np.where(image_mask, -100, ids)
    labels[:, : t // 4] = -100  # instruction span masked
    s = vis_cfg.image_size
    batch = batch_from_arrays({
        "input_ids": ids,
        "segment_ids": np.ones((b, t), np.int32),
        "image_mask": image_mask,
        "image_pos": image_pos,
        "pixels": np.random.randn(b, 1, 3, s, s).astype(np.float32),
        "pixel_valid": np.ones((b, 1), bool),
        "labels": labels,
    })

    # Optional XLA compiler options, e.g.
    # BENCH_COMPILER_OPTS=xla_tpu_scoped_vmem_limit_kib=24576 — reaches the
    # remote compile helper via PJRT compiler_options (XLA_FLAGS is parsed
    # by the LOCAL cpu-client build, which rejects TPU-only flags).
    copts_env = os.environ.get("BENCH_COMPILER_OPTS", "")
    if copts_env:
        copts = dict(kv.split("=", 1) for kv in copts_env.split(","))
        log(f"AOT-compiling with compiler_options={copts}")
        compiled = step.lower(state, teacher_params, batch).compile(
            compiler_options=copts)
        step = compiled

    log("compiling the distillation step (first call)...")
    t0 = time.time()
    state, metrics = step(state, teacher_params, batch)
    jax.block_until_ready(metrics["loss"])
    log(f"compile+first step: {time.time() - t0:.1f}s  "
        f"loss={float(metrics['loss']):.4f}")

    profile_dir = os.environ.get("BENCH_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        for _ in range(3):
            state, metrics = step(state, teacher_params, batch)
        float(metrics["loss"])  # force execution (block_until_ready lies
        # on the remote backend - see BENCH_NOTES.md)
        jax.profiler.stop_trace()
        _summarize_profile(profile_dir)

    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, teacher_params, batch)
    jax.block_until_ready(metrics["loss"])
    elapsed = time.time() - t0

    tokens = b * t * steps
    tok_per_sec = tokens / elapsed

    # model FLOPs: student fwd+bwd = 6*P_act*tok, teacher fwd = 2*P_t*tok,
    # vision fwd (frozen, shared encode teacher+student) ~= 2 * 2*P_vit*576*B.
    # Router-only training elides the FFN/attn dW matmuls (stop-grad DCE),
    # so its student cost is 4*P_act (fwd + dL/dx), not 6.
    p_s = activated_params(student_llava.llm)
    p_t = activated_params(teacher_llava.llm)
    p_v = 0.30e9
    s_mult = 4 if train_set == "router" else 6
    flops_per_step = (s_mult * p_s + 2 * p_t) * b * t + 2 * (2 * p_v * 577 * b)
    achieved = flops_per_step * steps / elapsed
    peak = 197e12  # v5e bf16 peak
    mfu = achieved / peak

    # Dual-denominator MFU (honest accounting for the int8 mix): the
    # convention above counts every model FLOP against the 197 TF/s bf16
    # peak, but W8A8 matmuls run on the int8 MXU at 2x that — so a step
    # dominated by int8 can print "MFU 0.83" while using ~0.5 of the
    # hardware's ceiling for its dtype mix.  mfu_dtype below charges each
    # matmul against its own peak: sum_d(flops_d / peak_d) / elapsed.
    head_q = os.environ.get("BENCH_STUDENT_HEAD_QUANT", "1") == "1"
    a_s, f_s, r_s, h_s = _matmul_param_split(student_llava.llm)
    a_t, f_t, r_t, h_t2 = _matmul_param_split(teacher_llava.llm)
    tok = b * t
    fi = fb = 0.0  # int8 / bf16 matmul FLOPs per step
    if teacher_quant.startswith("int8"):
        fi += 2 * (a_t + f_t) * tok
        if teacher_quant == "int8_head":
            fi += 2 * h_t2 * tok
        else:
            fb += 2 * h_t2 * tok
    else:
        fb += 2 * (a_t + f_t + h_t2) * tok
    if train_set == "router":
        # frozen body: fwd + dL/dx (dW elided); trainable router: 6x
        if body_quant:
            fi += 4 * (a_s + f_s) * tok
        else:
            fb += 4 * (a_s + f_s) * tok
        fb += 6 * r_s * tok
    else:
        fb += 6 * (f_s + r_s) * tok            # trainable FFNs + router
        if attn_quant:
            fi += 4 * a_s * tok                # frozen attention, fwd + dx
        else:
            fb += 4 * a_s * tok
    if head_q:
        fi += 4 * h_s * tok                    # frozen student head, fwd + dx
    else:
        fb += 4 * h_s * tok
    fb += 2 * (2 * p_v * 577 * b)
    mfu_dtype = (fi / 394e12 + fb / 197e12) * steps / elapsed
    log(f"elapsed {elapsed:.2f}s for {steps} steps; "
        f"{tok_per_sec:.0f} tok/s/chip; MFU={mfu:.3f} vs bf16 peak, "
        f"{mfu_dtype:.3f} dtype-aware (int8 matmuls at the 394 TF/s int8 "
        f"peak; int8 share {fi / (fi + fb):.0%}) "
        f"(P_act student {p_s / 1e9:.2f}B, teacher {p_t / 1e9:.2f}B)")

    metric = "mimic_distill_tokens_per_sec_per_chip"
    if cfg_name != "default":
        metric += f"_{cfg_name}"
    # Cliff guard (round-4 verdict: the auto-tuned defaults sit next to
    # documented XLA performance cliffs, e.g. the 4-row teacher-chunk
    # collapse to 519 tok/s).  If a toolchain bump lands the default on a
    # cliff, say so loudly and name the known-good fallbacks instead of
    # silently recording a collapsed headline.
    _expect = {"flagship": 5000.0, "flagship_fit": 6800.0}.get(cfg_name)
    if _expect and tok_per_sec < 0.7 * _expect:
        log(f"WARNING: {tok_per_sec:.0f} tok/s is <70% of the recorded "
            f"{_expect:.0f} for this config — likely an XLA/layout cliff "
            f"after a toolchain change.  Known-good fallbacks to try: "
            f"BENCH_TEACHER_CHUNKS=4 (2-row teacher chunks), "
            f"BENCH_CHUNK=2048, BENCH_STREAM_DH=0 BENCH_INT8_DH=0 "
            f"(two-pass exact loss), BENCH_FWD_CHUNKS=1.  See "
            f"BENCH_NOTES.md rounds 8-11 for the sweep tables.")
    print(json.dumps({
        "metric": metric,
        "value": round(tok_per_sec, 1),
        "unit": f"tokens/s/chip ({student_size}"
                + ("-MoE" if use_moe else " dense")
                + f" student, {teacher_size} teacher"
                + (" int8-W8A8" if teacher_quant.startswith("int8") else "")
                + f", T={t}, bf16"
                + (", int8-W8A8 student body" if body_quant else "")
                + (", int8 frozen attn" if attn_quant else "")
                + (", router-only train set" if train_set == "router"
                   else ", record train set (all FFN + router)")
                + (", adafactor" if opt_name == "adafactor" else "")
                + (f", accum={accum} in-batch" if accum > 1 else "")
                + (", streamed STE dh" if tcfg.kd_stream_dh
                   and tcfg.kd_int8_dh else "")
                + ")",
        # HONEST headline: dtype-aware MFU (int8 matmuls charged their real
        # 394 TF/s peak) vs the 0.40 BASELINE.md target; bf16-peak ratio
        # kept alongside for context.
        "vs_baseline": round(mfu_dtype / 0.40, 3),
        "vs_baseline_bf16_peak": round(mfu / 0.40, 3),
        "mfu_bf16_peak": round(mfu, 3),
        "mfu_dtype_aware": round(mfu_dtype, 3),
    }))


def _eval_batch(cfg, b, t, n_img, seed=0):
    """Synthetic right-padded VQA batch: [image tokens][prompt text]."""
    rng = np.random.RandomState(seed)
    ids = rng.randint(10, 1000, size=(b, t)).astype(np.int32)
    image_mask = np.zeros((b, t), bool)
    image_mask[:, 1:1 + n_img] = True
    image_pos = np.zeros((b, t), np.int32)
    for i in range(b):
        image_pos[i, 1:1 + n_img] = i * n_img + np.arange(n_img)
    s = cfg.vision.image_size
    return {
        "input_ids": ids,
        "segment_ids": np.ones((b, t), np.int32),
        "image_mask": image_mask,
        "image_pos": image_pos,
        "pixels": rng.randn(b, 1, 3, s, s).astype(np.float32),
        "pixel_valid": np.ones((b, 1), bool),
        "labels": np.where(image_mask, -100, ids),
    }


def bench_eval():
    """Eval-generation throughput (BASELINE.json metric #2): batched cached
    decode through the generation stack eval/generate.py uses, vs the
    reference's decode ALGORITHM — bs=1 with use_cache=False, i.e. a full
    re-forward (incl. the LM head over every position) per generated token
    (model_vqa_loader.py:118-130 + llava_arch.py prepare) — measured on the
    same chip, same model, same prompt/new-token shapes.
    """
    import jax
    import jax.numpy as jnp

    from llavamod_tpu.generation import GenerationConfig, generate
    from llavamod_tpu.models import llava
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import QWEN1_5_1_8B
    from llavamod_tpu.models.llm.upcycle import upcycle
    from llavamod_tpu.models.vision.vit import CLIP_VIT_L_336
    from llavamod_tpu.train.steps import batch_from_arrays

    # batch sweep (BENCH_NOTES round-6): bf16 3.06 (B=8) -> 5.33 (B=24) ->
    # 4.74 (B=32); int8 peaks at B=24 too (6.14), B>=28 OOM.  B=16 with
    # int8 weights hits an isolated XLA emitter cliff (1.82) — avoid.
    b = int(os.environ.get("BENCH_BATCH", "24"))
    prompt_t = int(os.environ.get("BENCH_SEQ", "640"))  # 576 image + text
    new_tokens = int(os.environ.get("BENCH_NEW_TOKENS", "128"))
    runs = int(os.environ.get("BENCH_RUNS", "4"))
    kv = os.environ.get("BENCH_KV", "int8")             # int8 | bfloat16
    # BENCH_EVAL_QUANT=int8: W8A8 student serving (attention/MLP/experts/
    # head on the int8 MXU, half the weight reads).  Default bf16 = the
    # parity configuration with the reference's fp16 eval.
    weight_quant = os.environ.get("BENCH_EVAL_QUANT", "")
    with_ref = os.environ.get("BENCH_EVAL_REF", "1") == "1"
    dtype = jnp.bfloat16

    log(f"devices: {jax.devices()}")
    log(f"eval bench: B={b} prompt={prompt_t} new={new_tokens} kv={kv}")

    # the deployment target: the 2B-activated MoE student of record
    cfg = LlavaConfig(llm=QWEN1_5_1_8B, vision=CLIP_VIT_L_336,
                      projector_type="mlp2x_gelu", max_images=1)
    log("initializing params (bf16)...")
    params = llava.init(cfg, jax.random.PRNGKey(0), dtype=dtype)
    moe_llm, moe_params = upcycle(cfg.llm, params["llm"], moe_mode="sparse",
                                  num_experts=4, top_k=2,
                                  capacity_factor=1.5,
                                  eval_capacity_factor=2.0)
    cfg = cfg.replace(llm=moe_llm.replace(moe_gating_group_size=prompt_t))
    params["llm"] = moe_params
    if weight_quant == "int8":
        from llavamod_tpu.models.llm import decoder as _dec

        params["llm"] = _dec.quantize_decoder_int8(
            params["llm"], include_lm_head=True, include_experts=True)
        log("student quantized to int8 W8A8 (attn/MLP/experts/head)")

    batch = batch_from_arrays(_eval_batch(cfg, b, prompt_t,
                                          cfg.num_image_tokens))
    gcfg = GenerationConfig(max_new_tokens=new_tokens, cache_dtype=kv,
                            pad_token_id=0)

    log("compiling batched cached generation (prefill + decode scan)...")
    t0 = time.time()
    out = generate(params, cfg, batch, gcfg)  # np conversion forces execution
    log(f"compile+first generation: {time.time() - t0:.1f}s "
        f"(shape {out.shape})")

    profile_dir = os.environ.get("BENCH_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        generate(params, cfg, batch, gcfg)
        jax.profiler.stop_trace()
        _summarize_profile(profile_dir, steps=1)

    t0 = time.time()
    for _ in range(runs):
        out = generate(params, cfg, batch, gcfg)
    elapsed = time.time() - t0
    images_per_sec = b * runs / elapsed
    toks_per_sec = b * runs * new_tokens / elapsed
    log(f"batched cached decode: {images_per_sec:.2f} images/s, "
        f"{toks_per_sec:.0f} gen tok/s ({elapsed:.2f}s for {runs} runs)")

    ref_images_per_sec = None
    if with_ref:
        # reference algorithm: bs=1, no KV cache — one full forward (with
        # the LM head over ALL positions, as HF CausalLM does) per token,
        # next token fetched to host each step (the HF generate loop)
        total = prompt_t + new_tokens
        raw1 = _eval_batch(cfg, 1, total, cfg.num_image_tokens)
        raw1["segment_ids"][:, prompt_t:] = 0
        raw1["input_ids"][:, prompt_t:] = 0

        @jax.jit
        def nocache_next(params, batch, n):
            out = llava.forward(params, cfg, batch, train=False)
            logits = llava.logits(params, cfg, out.hidden)  # [1, T, V]
            last = jnp.take(logits[0], n - 1, axis=0)
            return jnp.argmax(last).astype(jnp.int32)

        log("compiling the reference-algorithm loop (bs=1, no cache)...")
        ids = raw1["input_ids"].copy()
        seg = raw1["segment_ids"].copy()
        t0 = time.time()
        nxt = int(nocache_next(params, batch_from_arrays(
            {**raw1, "input_ids": ids, "segment_ids": seg}), prompt_t))
        log(f"compile+first token: {time.time() - t0:.1f}s")

        n_ref = max(1, int(os.environ.get("BENCH_REF_TOKENS",
                                          str(new_tokens))))
        t0 = time.time()
        for i in range(n_ref):
            ids[0, prompt_t + i] = nxt
            seg[0, prompt_t + i] = 1
            nxt = int(nocache_next(params, batch_from_arrays(
                {**raw1, "input_ids": ids, "segment_ids": seg}),
                prompt_t + i + 1))
        ref_elapsed = (time.time() - t0) * (new_tokens / n_ref)
        ref_images_per_sec = 1.0 / ref_elapsed
        log(f"reference algorithm: {ref_images_per_sec:.3f} images/s "
            f"({ref_elapsed:.2f}s per {new_tokens}-token answer)")

    vs = (round(images_per_sec / ref_images_per_sec, 1)
          if ref_images_per_sec else None)
    print(json.dumps({
        "metric": "eval_images_per_sec_batched_generation",
        "value": round(images_per_sec, 2),
        "unit": f"images/s (2B-activated MoE student"
                + (" int8-W8A8" if weight_quant == "int8" else "")
                + f", B={b}, prompt {prompt_t}, {new_tokens} new tokens, "
                f"{kv} KV)",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
