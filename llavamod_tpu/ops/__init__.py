from llavamod_tpu.ops.norms import rms_norm, layer_norm
from llavamod_tpu.ops.rope import apply_rope, rope_table
from llavamod_tpu.ops.attention import dot_product_attention
from llavamod_tpu.ops.losses import (
    chunked_lse_and_gather,
    chunked_kd_cross_entropy,
    softmax_cross_entropy,
    kd_align_loss,
    sequence_log_prob,
    dpo_loss,
)
from llavamod_tpu.ops.moe import top_k_gating, moe_ffn, GatingConfig
