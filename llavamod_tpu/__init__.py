"""llavamod_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for training small
multimodal LLMs by distillation from a large teacher MLLM.

Capabilities mirror shufangxun/LLaVA-MoD (see /root/repo/SURVEY.md):
  stage 1: vision->LLM adaptor (projector) pretraining,
  stage 2: mimic distillation (token-level KL, dense->dense then dense->sparse
           after upcycling the student into a top-k MoE),
  stage 3: preference distillation (DPO / KTO-pair on chosen/rejected pairs),
plus batched eval generation, benchmark scorers, and an interactive CLI.

The implementation is TPU-first: a single pjit program over a
(data, fsdp, expert, tensor) mesh runs teacher and student together; MoE
dispatch rides ICI all-to-alls emitted by GSPMD from einsum shardings; the
151k-vocab distillation KL is a vocab-chunked fused kernel; attention is a
Pallas flash kernel.  There is no translation of the reference's
DeepSpeed/NCCL/torch machinery anywhere in this tree.
"""

__version__ = "0.2.0"
