"""Training configuration.

One explicit dataclass replacing the reference's five HfArgumentParser
dataclasses (config/args.py:8-133).  Defaults are the recipe of record
(shells/train/qwen/{pretrain,dense2dense_distillation,
dense2sparse_distillation,preference_distillation}.sh).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # --- optimization ---
    # adamw = the reference recipe (AdamW via DeepSpeed, dpo_zero2.json);
    # adafactor = factored-second-moment state (~0 bytes/param) for
    # full-FFN train sets that cannot carry Adam m+v on one chip's HBM
    optimizer: str = "adamw"                  # adamw | adafactor
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = None   # separate LR for the projector
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.03
    lr_schedule: str = "cosine"               # cosine | linear | constant
    total_steps: int = 1000
    grad_accum_steps: int = 1
    seed: int = 42

    # --- stage / trainable selection ---
    stage: str = "pretrain"  # pretrain | finetune | align | dpo
    tune_mm_mlp_adapter: bool = False          # stage-1: projector only
    freeze_mm_mlp_adapter: bool = False
    train_modules: Tuple[str, ...] = ()        # substrings; empty = all of llm
    moe_finetune: bool = False

    # --- distillation (align) ---
    align_loss_type: str = "only_kd"           # only_kd | kd_lm
    distill_all_tokens: bool = False
    moe_loss_enable: bool = True
    kd_vocab_limit: Optional[int] = None       # e.g. 151936 (qwen shared prefix)

    # --- preference (dpo) ---
    dpo_beta: float = 0.1
    dpo_loss_type: str = "kto_pair"            # sigmoid|hinge|ipo|kto_pair
    dpo_label_smoothing: float = 0.0
    reference_free: bool = False

    # --- numerics ---
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    remat: bool = True
    # Residual policy for the fused backward+update step (fused_steps.py):
    #   repeat    — save each repeat's INPUT only; the backward vjp re-runs
    #               the repeat forward (per-repeat remat; minimum memory)
    #   save_dots — carry each repeat's vjp residuals filtered to matmul
    #               outputs (dots_with_no_batch_dims_saveable); the backward
    #               skips the matmul recompute.  Combine with
    #               DecoderConfig.remat_policy='moe' to keep the expert
    #               intermediates (the dominant activation cost) rematted.
    #   save_all  — carry full vjp residuals (no recompute at all)
    fused_remat: str = "repeat"              # repeat | save_dots | save_all
    # Fused-step teacher forward in batch-row chunks (lax.map) instead of
    # one folded-batch call.  The folded teacher forward's working set at
    # accum=8 record shapes costs ~20% extra HBM traffic vs B=1 (profiled,
    # BENCH_NOTES round-8); chunking over rows is exact for a dense teacher
    # (per-sequence attention, per-token norms).  -1 = auto (one chunk per
    # accumulation microbatch when accum > 1 and the teacher is dense);
    # 0/1 = off; N = explicit chunk count (must divide the folded batch).
    fused_teacher_chunks: int = -1
    # Accumulation microbatches per backward vjp call in the fused step's
    # reverse scan.  1 = one vjp per microbatch (minimum residual memory);
    # k = recompute+vjp k microbatches at a time (k x the residual
    # transient, fewer/larger kernels); -1 = auto (= 1: swept at record
    # shapes, chunked backward loses — 2-mb 4563 / 4-mb see BENCH_NOTES
    # round-8 — unlike the teacher forward where 2-row chunks win).  Only
    # multiples of whole microbatches are legal (gating exactness); must
    # divide grad_accum_steps.
    fused_bwd_microbatches: int = -1
    # Forward-scan batch-row chunks in the fused step (lax.map inside each
    # repeat body).  The folded forward's working set at accum=8 is what
    # the 6.8% accumulation tax mostly buys; 2-row chunks won ~4% on the
    # teacher forward and this applies the same shape to the student's
    # forward scan.  Exact when gating groups tile the chunk (the same
    # mb_gating_exact condition).  -1 = auto; 0/1 = off; N = chunk count.
    fused_fwd_chunks: int = -1
    # In-step chunked gradient accumulation for the STANDARD (non-fused)
    # pretrain/SFT step: split the batch into N row chunks, run each
    # chunk's forward+backward sequentially (lax.scan) and sum the
    # token-weighted gradients — EXACT full-batch gradients (CE chunks
    # combine by token count; the MoE aux loss by chunk mean, legal when
    # gating groups tile the chunk, else auto-disabled).  The point is
    # MEMORY: per-chunk residuals replace the full-batch residual working
    # set, so big-batch frozen-body configs (stage-1: B=8 T=2048 residuals
    # measured 29.4 GB on a 15.75 GB v5e) can turn full rematerialization
    # OFF instead — trading the ~2P recompute for a small sequential scan.
    # 0/1 = off; N must divide the batch.
    grad_row_chunks: int = 1
    vocab_chunk: int = 2048  # sweep on v5e: 2048 best (BENCH_NOTES.md)
    attn_impl: str = "auto"                    # auto | flash | xla
    # Run the frozen vision tower once per step and feed both teacher and
    # student (valid because the tower is frozen and both sides start from
    # the same CLIP checkpoint; auto-disabled if the vision configs differ).
    share_vision_tower: bool = True
    # int8 (W8A8) student LM head inside the chunked losses.  ONLY valid
    # when the head is frozen (the align recipe of record trains FFN +
    # router); backward through the quantized logits is the standard
    # straight-through estimate.  Quantized on the fly from the live params
    # each step (a [V, D] elementwise pass) so no optimizer/state changes.
    student_head_quant: bool = False
    # opt-in: run the KD losses' dL/dhidden matmul through the int8
    # student head on the int8 MXU with dynamically quantized cotangent
    # rows (straight-through estimate, same scheme as the int8 body
    # matmuls) instead of the exact dequantized-bf16 path.  Only
    # meaningful with student_head_quant/int8-head params.
    kd_int8_dh: bool = False
    # opt-in: stream the dh accumulators (p_s@W, p_t@W) through the KD
    # forward scan so the loss backward never re-touches the heads —
    # costs [N, Ds] x2 fp32 residuals per microbatch (~268 MB at record
    # shapes, which is exactly why it is NOT the default there); only
    # active for int8 student heads.  Measured ~neutral on v5e (the
    # removed int8 logit repasses cost about what the added bf16
    # accumulator matmuls do); see BENCH_NOTES round-11.
    kd_stream_dh: bool = False
    # int8 (W8A8) student decoder BODY — attention + dense MLP + experts;
    # the router stays float.  ONLY valid when every quantized weight is
    # frozen (router-only train sets): the body never updates, forward
    # numerics are the W8A8 serving path, and the router gradient flows
    # through the quantized matmuls via the straight-through custom_vjps
    # (decoder.dense_int8 & co).  run.py verifies the freeze against the
    # actual trainable mask and stashes the float body for export.
    student_body_quant: bool = False

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
