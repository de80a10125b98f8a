"""Generic decoder configuration.

One flag-driven decoder replaces the reference's ten vendored per-family
modeling files (SURVEY.md §2.7: qwen/qwen1.5/qwen2/llama/gemma2/phi/minicpm/
stablelm/mistral/mpt, ~12k LoC of near-duplicates).  Each family is a preset
of `DecoderConfig`; the compute path is a single implementation in
models/llm/decoder.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from llavamod_tpu.utils.registry import Registry


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    name: str = "decoder"
    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    num_kv_heads: int = 16
    head_dim: Optional[int] = None          # defaults to hidden//heads
    max_position_embeddings: int = 32768
    rope_theta: float = 1e6
    partial_rotary_factor: float = 1.0       # phi=0.5, stablelm=0.25
    norm: str = "rmsnorm"                    # rmsnorm | layernorm
    rms_norm_eps: float = 1e-6
    norm_offset: float = 0.0                 # gemma: weight is (1 + w)
    activation: str = "silu"                 # silu | gelu | gelu_tanh
    gated_mlp: bool = True                   # SwiGLU-style gate*up
    qkv_bias: bool = False                   # qwen1.5/qwen2: True
    o_bias: bool = False
    mlp_bias: bool = False
    attn_logit_softcap: Optional[float] = None   # gemma2: 50.0
    final_logit_softcap: Optional[float] = None  # gemma2: 30.0
    query_pre_attn_scalar: Optional[float] = None  # gemma2 scale override
    post_attn_norm: bool = False             # gemma2 post-sublayer norms
    post_mlp_norm: bool = False
    parallel_block: bool = False             # phi: attn and mlp in parallel
    tie_word_embeddings: bool = False
    lm_head_bias: bool = False               # phi-2: lm_head has a bias
    embed_scale: Optional[float] = None      # gemma: sqrt(hidden); minicpm: scale_emb
    # MiniCPM mup scalings (reference modeling_minicpm.py:818,825,1214):
    # every sublayer output is multiplied by scale_depth/sqrt(num_layers)
    # before the residual add, and the hidden state is multiplied by
    # dim_model_base/hidden_size before the LM head.
    residual_scale: Optional[float] = None
    logit_scale: Optional[float] = None
    sliding_window: Optional[int] = None
    sliding_window_pattern: int = 1          # gemma2: every 2nd layer global
    layernorm_eps: float = 1e-5
    use_rope: bool = True                    # mpt: False (ALiBi only)
    alibi: bool = False                      # mpt: True
    # qwen-1.0 long-context inference scaling (reference vendored
    # modeling_qwen.py:286-298,481-491).  Both are identity below
    # rope_seq_length, so they can stay enabled during training.
    use_dynamic_ntk: bool = False            # NTK-aware rope base rescale
    use_logn_attn: bool = False              # log_n query scaling
    rope_seq_length: int = 2048              # training context they anchor to

    # --- MoE block (populated after sparse upcycling; None = dense) ---
    moe_num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.5
    moe_eval_capacity_factor: float = 2.0
    moe_min_capacity: int = 4
    moe_layers: Tuple[int, ...] = ()
    moe_use_residual: bool = False
    router_aux_loss_coef: float = 0.01
    # Tokens per independent gating group (0 = all tokens in one group).
    # The [S, E, C] dispatch einsums cost O(S * C) with C proportional to S,
    # i.e. quadratic in tokens; fixed-size groups make it linear — and match
    # DeepSpeed's semantics, where each DP rank gates only its local batch.
    moe_gating_group_size: int = 0
    # 'gather' (default): scatter/gather dispatch — O(E*C*D) data movement
    # instead of the one-hot einsums' O(S*E*C*D) MXU work; bit-identical
    # assignment (tests/test_ops_moe.py).  'einsum': the one-hot contraction
    # (GSPMD lowers it to all-to-alls under an expert mesh).  'ragged': same
    # gather assignment, but the expert matmuls run as lax.ragged_dot over
    # only the kept rows — cuts the capacity padding's 1/capacity_factor
    # extra FLOPs (E*C = capacity_factor*k*S rows -> <= S*k useful rows).
    moe_dispatch: str = "gather"

    # --- parallelism strategy (activations) ---
    # Sequence parallelism (Megatron-SP semantics, the SURVEY §2.10 stretch
    # the reference lacks): constrain the [B, T, D] residual stream to be
    # T-sharded over the mesh 'tensor' axis between blocks; GSPMD then emits
    # all-gather before the TP matmuls and reduce-scatter after, so norms/
    # residual memory scale 1/tp.  Requires an active mesh with a 'tensor'
    # axis (set by the trainer, not by model presets).
    seq_shard_activations: bool = False
    # Pipeline parallelism (parallel/pipeline.py; beyond-reference like
    # TP/SP): number of GPipe microbatches when the ambient mesh has a
    # 'pipe' axis > 1.  0 = one microbatch per stage (the minimum; bubble
    # fraction (P-1)/(M+P-1) shrinks as M grows).  Batch must divide M.
    pipeline_microbatches: int = 0

    # --- compile strategy ---
    # lax.scan over (period-stacked) layers: one traced layer block instead of
    # num_layers inlined copies => ~L/period x faster XLA compiles.
    scan_layers: bool = True
    # Same scan for the CACHED (decode) path, with per-layer cache rows as
    # scan inputs.  Default OFF: measured on v5e (24-layer 2B MoE student,
    # B=8 decode) the nested scan LOST 9% decode throughput and compiled
    # slower (103 s vs 72 s) than inline layers — keep for much deeper
    # models where inline decode tracing is the compile bottleneck.
    scan_layers_decode: bool = False
    # lax.scan unroll factor for the layer scan (>1 trades compile time for
    # less per-iteration loop overhead)
    scan_unroll: int = 1
    # remat policy inside the scanned block: 'none' recomputes everything
    # (min memory); 'dots' saves matmul outputs (jax dots_with_no_batch_dims
    # policy) trading HBM for less backward recompute.
    remat_policy: str = "none"

    def __post_init__(self):
        if self.head_dim is None:
            object.__setattr__(self, "head_dim", self.hidden_size // self.num_heads)

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def is_moe(self) -> bool:
        return self.moe_num_experts > 0 and len(self.moe_layers) > 0

    def replace(self, **kw) -> "DecoderConfig":
        return dataclasses.replace(self, **kw)


llm_configs: Registry[DecoderConfig] = Registry("llm config")


def _reg(cfg: DecoderConfig, *aliases: str) -> DecoderConfig:
    llm_configs.register(cfg.name, cfg, aliases=tuple(aliases))
    return cfg


# ---------------------------------------------------------------------------
# Family presets (sizes of record from the HF configs the reference targets)
# ---------------------------------------------------------------------------

QWEN2_0_5B = _reg(DecoderConfig(
    name="qwen2-0.5b", vocab_size=151936, hidden_size=896,
    intermediate_size=4864, num_layers=24, num_heads=14, num_kv_heads=2,
    rope_theta=1e6, rms_norm_eps=1e-6, qkv_bias=True,
    tie_word_embeddings=True), "qwen2_0_5b")

QWEN2_1_5B = _reg(DecoderConfig(
    name="qwen2-1.5b", vocab_size=151936, hidden_size=1536,
    intermediate_size=8960, num_layers=28, num_heads=12, num_kv_heads=2,
    rope_theta=1e6, rms_norm_eps=1e-6, qkv_bias=True,
    tie_word_embeddings=True), "qwen2_1_5b")

QWEN2_7B = _reg(DecoderConfig(
    name="qwen2-7b", vocab_size=152064, hidden_size=3584,
    intermediate_size=18944, num_layers=28, num_heads=28, num_kv_heads=4,
    rope_theta=1e6, rms_norm_eps=1e-6, qkv_bias=True), "qwen2_7b")

QWEN1_5_0_5B = _reg(DecoderConfig(
    name="qwen1.5-0.5b", vocab_size=151936, hidden_size=1024,
    intermediate_size=2816, num_layers=24, num_heads=16, num_kv_heads=16,
    rope_theta=1e6, rms_norm_eps=1e-6, qkv_bias=True,
    tie_word_embeddings=True), "qwen1_5_0_5b")

QWEN1_5_1_8B = _reg(DecoderConfig(
    name="qwen1.5-1.8b", vocab_size=151936, hidden_size=2048,
    intermediate_size=5504, num_layers=24, num_heads=16, num_kv_heads=16,
    rope_theta=1e6, rms_norm_eps=1e-6, qkv_bias=True), "qwen1_5_1_8b")

QWEN1_5_4B = _reg(DecoderConfig(
    name="qwen1.5-4b", vocab_size=151936, hidden_size=2560,
    intermediate_size=6912, num_layers=40, num_heads=20, num_kv_heads=20,
    rope_theta=5e6, rms_norm_eps=1e-6, qkv_bias=True), "qwen1_5_4b")

QWEN1_5_7B = _reg(DecoderConfig(
    name="qwen1.5-7b", vocab_size=151936, hidden_size=4096,
    intermediate_size=11008, num_layers=32, num_heads=32, num_kv_heads=32,
    rope_theta=1e6, rms_norm_eps=1e-6, qkv_bias=True), "qwen1_5_7b")

LLAMA2_7B = _reg(DecoderConfig(
    name="llama-2-7b", vocab_size=32000, hidden_size=4096,
    intermediate_size=11008, num_layers=32, num_heads=32, num_kv_heads=32,
    rope_theta=1e4, rms_norm_eps=1e-5), "llama2_7b", "llama")

MISTRAL_7B = _reg(DecoderConfig(
    name="mistral-7b", vocab_size=32000, hidden_size=4096,
    intermediate_size=14336, num_layers=32, num_heads=32, num_kv_heads=8,
    rope_theta=1e4, rms_norm_eps=1e-5, sliding_window=4096),
    "mistral_7b", "mistral", "openchat")

GEMMA2_2B = _reg(DecoderConfig(
    name="gemma-2-2b", vocab_size=256000, hidden_size=2304,
    intermediate_size=9216, num_layers=26, num_heads=8, num_kv_heads=4,
    head_dim=256, rope_theta=1e4, rms_norm_eps=1e-6, norm_offset=1.0,
    activation="gelu_tanh", attn_logit_softcap=50.0, final_logit_softcap=30.0,
    query_pre_attn_scalar=256.0, post_attn_norm=True, post_mlp_norm=True,
    tie_word_embeddings=True, embed_scale=2304.0 ** 0.5,
    sliding_window=4096, sliding_window_pattern=2), "gemma2_2b", "gemma")

PHI2 = _reg(DecoderConfig(
    name="phi-2", vocab_size=51200, hidden_size=2560,
    intermediate_size=10240, num_layers=32, num_heads=32, num_kv_heads=32,
    rope_theta=1e4, norm="layernorm", activation="gelu_tanh", gated_mlp=False,
    qkv_bias=True, o_bias=True, mlp_bias=True, parallel_block=True,
    partial_rotary_factor=0.4, lm_head_bias=True), "phi2", "phi")

STABLELM_2_1_6B = _reg(DecoderConfig(
    name="stablelm-2-1.6b", vocab_size=100352, hidden_size=2048,
    intermediate_size=5632, num_layers=24, num_heads=32, num_kv_heads=32,
    rope_theta=1e4, norm="layernorm", partial_rotary_factor=0.25,
    qkv_bias=False), "stablelm_2_1_6b", "stablelm")

QWEN_7B_V1 = _reg(DecoderConfig(
    # Qwen-1.0 7B (reference vendored modeling_qwen.py): fused gated MLP
    # (w1/w2 halves of intermediate_size=22016 -> 11008 each), QKV bias,
    # untied head, dynamic-NTK + logn-attn long-context inference scaling
    # anchored at the 8192 training context (modeling_qwen.py:286-298).
    name="qwen-7b", vocab_size=151936, hidden_size=4096,
    intermediate_size=11008, num_layers=32, num_heads=32, num_kv_heads=32,
    rope_theta=1e4, rms_norm_eps=1e-6, qkv_bias=True,
    use_dynamic_ntk=True, use_logn_attn=True, rope_seq_length=8192,
    max_position_embeddings=8192), "qwen_7b", "qwen-v1")

MPT_7B = _reg(DecoderConfig(
    # MPT-7B (reference llava_mpt.py + vendored mpt/): ALiBi attention, no
    # positional embeddings, LayerNorm, non-gated GELU MLP, no biases.
    name="mpt-7b", vocab_size=50432, hidden_size=4096,
    intermediate_size=16384, num_layers=32, num_heads=32, num_kv_heads=32,
    norm="layernorm", activation="gelu", gated_mlp=False,
    use_rope=False, alibi=True, max_position_embeddings=2048,
    tie_word_embeddings=True), "mpt_7b", "mpt")

MINICPM_2B = _reg(DecoderConfig(
    # MiniCPM-2B mup scalings of record (reference modeling_minicpm.py:
    # embeds * scale_emb=12 at :1040, sublayer outputs * scale_depth/sqrt(L)
    # = 1.4/sqrt(40) at :818,825, hidden / (hidden/dim_model_base) = * 256/2304
    # before the head at :1214).
    name="minicpm-2b", vocab_size=122753, hidden_size=2304,
    intermediate_size=5760, num_layers=40, num_heads=36, num_kv_heads=36,
    rope_theta=1e4, rms_norm_eps=1e-5, tie_word_embeddings=True,
    embed_scale=12.0, residual_scale=1.4 / 40.0 ** 0.5,
    logit_scale=256.0 / 2304.0),
    "minicpm_2b", "minicpm")


def tiny_config(**kw) -> DecoderConfig:
    """A small config for tests/CI."""
    base = dict(name="tiny", vocab_size=512, hidden_size=64,
                intermediate_size=128, num_layers=2, num_heads=4,
                num_kv_heads=2, max_position_embeddings=512, rope_theta=1e4,
                qkv_bias=True)
    base.update(kw)
    return DecoderConfig(**base)
