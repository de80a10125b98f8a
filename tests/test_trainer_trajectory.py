"""Multi-step optimizer-trajectory parity vs the LIVE reference trainer.

Per-step loss parity (torch oracles) and structural mirrors of the
optimizer/schedule existed before; this file closes the last gap in the
"loss parity" claim (BASELINE.md): it runs the reference's OWN
`AlignTrainer` (HF `Trainer.train`: AdamW + cosine schedule + warmup +
global grad-norm clipping + per-group weight decay, reference
align_trainer.py:326-436,530-589) for 10 steps on a tiny text-only model
on CPU, and our `make_align_step` + `TrainState`/optax pipeline from
IDENTICAL weights and batches, then pins the two loss trajectories to
~1e-3.  Ten compounding updates make any divergence in the optimizer
math, LR schedule off-by-ones, clipping, or loss normalization blow up
quickly — per-step parity alone cannot catch those.

Scope notes:
  * text-only (the reference's tiny model has no vision tower and its
    CLIP builder requires a network fetch; multimodal splice parity is
    covered by tests/test_steps.py and tests/test_reference_interop.py).
  * weight_decay = 0, matching EVERY reference recipe of record
    (shells/train/qwen/*.sh: --weight_decay 0.).  At wd > 0 the two
    implementations intentionally differ on RMSNorm scales: HF's
    get_parameter_names(model, ALL_LAYERNORM_LAYERS) only exempts
    nn.LayerNorm instances, so the reference DECAYS Qwen2RMSNorm weights;
    our ndim>=2 mask exempts all norm scales (the usual AdamW practice).
  * a handful of `Shim` overrides adapt the reference trainer (written
    against transformers 4.37) to this image's 4.57 Trainer call
    signatures — signatures only, no semantics.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file

REFERENCE = "/root/reference"

B, T, STEPS = 4, 32, 10
LR, WARMUP_RATIO = 1e-3, 0.1


@pytest.fixture(scope="module")
def ref_trainer_mod():
    """Import the reference AlignTrainer with its missing deps stubbed
    (same pattern as tests/test_reference_interop.py) and the
    transformers-4.57 import moves re-exposed."""
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not present")
    import torch.nn as nn

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    class Block(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    class MoE(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    class SPP:
        def __init__(self, *a, **k):
            pass

    stub("timm")
    stub("timm.models")
    stub("timm.models.vision_transformer", Block=Block)
    ds = stub("deepspeed")
    moe = stub("deepspeed.moe")
    lay = stub("deepspeed.moe.layer", MoE=MoE)
    ds.moe, moe.layer = moe, lay
    # llava_trainer's maybe_zero_3 imports these at call time (no-ops when
    # params carry no ds_id, i.e. always here)
    ds.zero = stub("deepspeed.zero", GatheredParameters=None)
    rt = stub("deepspeed.runtime")
    rtz = stub("deepspeed.runtime.zero")
    rt.zero = rtz
    rtz.partition_parameters = stub(
        "deepspeed.runtime.zero.partition_parameters", ZeroParamStatus=object)
    stub("sentencepiece", SentencePieceProcessor=SPP)

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    # transformers 4.57 moved these off transformers.trainer's namespace;
    # the reference (4.37-era) imports them from there
    import transformers.trainer as hf_trainer

    if not hasattr(hf_trainer, "ALL_LAYERNORM_LAYERS"):
        from transformers.pytorch_utils import ALL_LAYERNORM_LAYERS

        hf_trainer.ALL_LAYERNORM_LAYERS = ALL_LAYERNORM_LAYERS
    if not hasattr(hf_trainer, "get_parameter_names"):
        from transformers.trainer_pt_utils import get_parameter_names

        hf_trainer.get_parameter_names = get_parameter_names
    if not hasattr(hf_trainer, "is_sagemaker_mp_enabled"):
        from transformers.utils import is_sagemaker_mp_enabled

        hf_trainer.is_sagemaker_mp_enabled = is_sagemaker_mp_enabled
    if not hasattr(hf_trainer, "has_length"):
        from transformers.trainer_utils import has_length

        hf_trainer.has_length = has_length

    import llavamod.train.align_trainer as at
    import llavamod.train.dpo_trainer as dt
    import llavamod.train.llava_trainer as lt
    from llavamod.config.args import TrainingArguments
    from llavamod.model.language_model.llava_qwen1_5 import (
        LlavaQwen1_5Config,
        LlavaQwen1_5ForCausalLM,
    )

    return types.SimpleNamespace(
        AlignTrainer=at.AlignTrainer, DPOTrainer=dt.DPOTrainer,
        LLaVATrainer=lt.LLaVATrainer,
        TrainingArguments=TrainingArguments,
        model_cls=LlavaQwen1_5ForCausalLM, cfg_cls=LlavaQwen1_5Config)


def _tiny_ref_model(mod, seed):
    cfg = mod.cfg_cls(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False)
    torch.manual_seed(seed)
    model = mod.model_cls(cfg)
    # reference train entries set this before Trainer.train (train.py,
    # align_train.py); the vendored 4.37 cache API crashes otherwise
    model.config.use_cache = False
    return model


def _batch_arrays():
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 500, (B, T))
    labels = ids.copy()
    labels[:, :8] = -100  # "instruction" prefix, masked from the losses
    return ids, labels


def _reference_trajectory(mod, student, teacher, ids, labels, tmp_path,
                          loss_type):
    """Drive the reference AlignTrainer's real Trainer.train loop."""
    import torch.nn as nn

    class RefWrap(nn.Module):
        # single-process accelerate returns the model unwrapped, but
        # AlignTrainer.__init__ dereferences .module (written for the
        # DeepSpeed-wrapped path, align_trainer.py:305-308)
        def __init__(self, inner):
            super().__init__()
            self.module = inner

        def forward(self, *a, **kw):
            return self.module(*a, **kw)

    data = [dict(input_ids=torch.tensor(ids[i]),
                 labels=torch.tensor(labels[i]),
                 attention_mask=torch.ones(T, dtype=torch.long))
            for i in range(B)]

    class DS(torch.utils.data.Dataset):
        def __len__(self):
            return B

        def __getitem__(self, i):
            return data[i]

    def collate(feats):
        return {k: torch.stack([f[k] for f in feats]) for k in feats[0]}

    args = mod.TrainingArguments(
        output_dir=str(tmp_path / "ref_out"),
        per_device_train_batch_size=B, max_steps=STEPS,
        learning_rate=LR, weight_decay=0.0, warmup_ratio=WARMUP_RATIO,
        lr_scheduler_type="cosine", max_grad_norm=1.0, logging_steps=1,
        save_strategy="no", report_to=[], use_cpu=True, seed=0,
        remove_unused_columns=False, dataloader_num_workers=0)
    args.moe_enable = False

    class Shim(mod.AlignTrainer):
        """transformers-4.57 call-signature adapters ONLY."""

        def compute_loss(self, model, inputs, return_outputs=False, **kw):
            # 4.46+ passes num_items_in_batch
            return mod.AlignTrainer.compute_loss(self, model, inputs,
                                                 return_outputs)

        def _get_train_sampler(self, dataset=None):  # 4.52+ passes dataset
            return mod.AlignTrainer._get_train_sampler(self)

        def log(self, logs, start_time=None):  # 4.47+ passes start_time
            return mod.AlignTrainer.log(self, logs)

    trainer = Shim(model=student, ref_model=RefWrap(teacher), args=args,
                   data_collator=collate, train_dataset=DS(),
                   loss_type=loss_type, moe_loss_enable=False)
    trainer.train()
    hist = [h for h in trainer.state.log_history if "loss" in h]
    assert len(hist) == STEPS
    return hist


def _our_trajectory(student, teacher, ids, labels, loss_type):
    """Same weights/batch through our align step + optax pipeline."""
    from llavamod_tpu.interop.hf import (
        decoder_config_from_hf,
        decoder_params_from_hf,
    )
    from llavamod_tpu.models import llava
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.vision.vit import tiny_vision_config
    from llavamod_tpu.train.config import TrainConfig
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.steps import batch_from_arrays, make_align_step

    dcfg = decoder_config_from_hf(student.config)
    vis = tiny_vision_config()
    cfg = LlavaConfig(llm=dcfg, vision=vis, projector_type="mlp2x_gelu",
                      max_images=1)
    params = llava.init(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params["llm"] = decoder_params_from_hf(dict(student.state_dict()), dcfg)
    # the step donates the student state; the teacher tree must not alias
    # its buffers (tower/projector values are unused anyway: no images)
    tparams = jax.tree_util.tree_map(jnp.copy, dict(params))
    tparams["llm"] = decoder_params_from_hf(dict(teacher.state_dict()), dcfg)

    n_img = (vis.image_size // vis.patch_size) ** 2
    batch = batch_from_arrays({
        "input_ids": ids.astype(np.int32),
        "segment_ids": np.ones((B, T), np.int32),
        "image_mask": np.zeros((B, T), bool),
        "image_pos": np.zeros((B, T), np.int32),
        "pixels": np.zeros((B, 1, 3, vis.image_size, vis.image_size),
                           np.float32),
        "pixel_valid": np.zeros((B, 1), bool),
        "labels": labels.astype(np.int32)})
    del n_img

    tcfg = TrainConfig(
        stage="align", align_loss_type=loss_type, optimizer="adamw",
        learning_rate=LR, weight_decay=0.0, warmup_ratio=WARMUP_RATIO,
        lr_schedule="cosine", total_steps=STEPS, max_grad_norm=1.0,
        compute_dtype="float32", remat=False, vocab_chunk=512,
        kd_vocab_limit=512, train_modules=(), moe_loss_enable=False,
        distill_all_tokens=False)
    state = TrainState.create(params, tcfg)
    step = make_align_step(cfg, cfg, tcfg)
    out = []
    for _ in range(STEPS):
        state, metrics = step(state, tparams, batch)
        out.append({k: float(v) for k, v in metrics.items()})
    return out


@pytest.mark.parametrize("loss_type", ["kd_lm", "only_kd"])
def test_align_loss_trajectory_matches_reference_trainer(
        ref_trainer_mod, tmp_path, loss_type):
    mod = ref_trainer_mod
    student = _tiny_ref_model(mod, 0)
    teacher = _tiny_ref_model(mod, 1)
    ids, labels = _batch_arrays()

    ours = _our_trajectory(student, teacher, ids, labels, loss_type)
    ref = _reference_trajectory(mod, student, teacher, ids, labels,
                                tmp_path, loss_type)

    ref_losses = np.array([h["loss"] for h in ref])
    our_losses = np.array([m["loss"] for m in ours])
    # the trainer must actually be training for the comparison to bite
    # (only_kd moves slowly at this scale: the student already nearly
    # matches the same-architecture teacher's smooth output distribution)
    floor = 0.05 if loss_type == "kd_lm" else 0.005
    assert ref_losses[-1] < ref_losses[0] - floor, ref_losses
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1.5e-3,
                               err_msg=f"{loss_type} loss trajectories")

    ref_align = np.array([h["loss/align"] for h in ref])
    our_align = np.array([m["loss/align"] for m in ours])
    np.testing.assert_allclose(our_align, ref_align, rtol=1.5e-3)
    if loss_type == "kd_lm":
        np.testing.assert_allclose(
            np.array([m["loss/lm"] for m in ours]),
            np.array([h["loss/lm"] for h in ref]), rtol=1.5e-3)

    # grad-norm trajectory (HF logs the pre-clip global norm); looser: the
    # two stacks compute it at different points but it must track
    np.testing.assert_allclose(
        np.array([m["grad_norm"] for m in ours]),
        np.array([h["grad_norm"] for h in ref]), rtol=3e-2)


# ---------------------------------------------------------------------------
# DPO (stage 3): reference dpo_trainer.py:462-641 vs our 2-forward step
# ---------------------------------------------------------------------------


def _pref_arrays():
    rng = np.random.RandomState(7)
    cids = rng.randint(5, 500, (B, T))
    rids = rng.randint(5, 500, (B, T))
    clab, rlab = cids.copy(), rids.copy()
    clab[:, :8] = -100
    rlab[:, :8] = -100
    return cids, clab, rids, rlab


def _reference_dpo_trajectory(mod, student, teacher, arrays, tmp_path,
                              loss_type):
    import torch.nn as nn

    cids, clab, rids, rlab = arrays

    class RefWrap(nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.module = inner

        def forward(self, *a, **kw):
            return self.module(*a, **kw)

    data = [dict(
        chosen_input_ids=torch.tensor(cids[i]),
        chosen_labels=torch.tensor(clab[i]),
        chosen_attention_mask=torch.ones(T, dtype=torch.long),
        rejected_input_ids=torch.tensor(rids[i]),
        rejected_labels=torch.tensor(rlab[i]),
        rejected_attention_mask=torch.ones(T, dtype=torch.long))
        for i in range(B)]

    class DS(torch.utils.data.Dataset):
        def __len__(self):
            return B

        def __getitem__(self, i):
            return data[i]

    def collate(feats):
        return {k: torch.stack([f[k] for f in feats]) for k in feats[0]}

    args = mod.TrainingArguments(
        output_dir=str(tmp_path / "ref_dpo_out"),
        per_device_train_batch_size=B, max_steps=STEPS,
        learning_rate=LR, weight_decay=0.0, warmup_ratio=WARMUP_RATIO,
        lr_scheduler_type="cosine", max_grad_norm=1.0, logging_steps=1,
        save_strategy="no", report_to=[], use_cpu=True, seed=0,
        remove_unused_columns=False, dataloader_num_workers=0)
    args.moe_enable = False

    class Shim(mod.DPOTrainer):
        """transformers-4.57 call-signature adapters ONLY."""

        def compute_loss(self, model, inputs, return_outputs=False, **kw):
            return mod.DPOTrainer.compute_loss(self, model, inputs,
                                               return_outputs)

        def _get_train_sampler(self, dataset=None):
            return mod.DPOTrainer._get_train_sampler(self)

        def log(self, logs, start_time=None):
            return mod.DPOTrainer.log(self, logs)

    trainer = Shim(model=student, ref_model=RefWrap(teacher), args=args,
                   data_collator=collate, train_dataset=DS(), beta=0.1,
                   loss_type=loss_type, moe_loss_enable=False)
    trainer.train()
    hist = [h for h in trainer.state.log_history if "loss" in h]
    assert len(hist) == STEPS
    return hist


def _our_dpo_trajectory(student, teacher, arrays, loss_type):
    from llavamod_tpu.interop.hf import (
        decoder_config_from_hf,
        decoder_params_from_hf,
    )
    from llavamod_tpu.models import llava
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.vision.vit import tiny_vision_config
    from llavamod_tpu.train.config import TrainConfig
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.steps import make_dpo_step

    cids, clab, rids, rlab = arrays
    dcfg = decoder_config_from_hf(student.config)
    vis = tiny_vision_config()
    cfg = LlavaConfig(llm=dcfg, vision=vis, projector_type="mlp2x_gelu",
                      max_images=1)
    params = llava.init(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params["llm"] = decoder_params_from_hf(dict(student.state_dict()), dcfg)
    rparams = jax.tree_util.tree_map(jnp.copy, dict(params))
    rparams["llm"] = decoder_params_from_hf(dict(teacher.state_dict()), dcfg)

    def side(prefix, ids, labels):
        return {
            prefix + "input_ids": np.asarray(ids, np.int32),
            prefix + "segment_ids": np.ones((B, T), np.int32),
            prefix + "image_mask": np.zeros((B, T), bool),
            prefix + "image_pos": np.zeros((B, T), np.int32),
            prefix + "labels": np.asarray(labels, np.int32)}

    batch = {**side("chosen_", cids, clab),
             **side("rejected_", rids, rlab),
             "pixels": np.zeros((B, 1, 3, vis.image_size, vis.image_size),
                                np.float32),
             "pixel_valid": np.zeros((B, 1), bool)}

    tcfg = TrainConfig(
        stage="dpo", optimizer="adamw", learning_rate=LR, weight_decay=0.0,
        warmup_ratio=WARMUP_RATIO, lr_schedule="cosine", total_steps=STEPS,
        max_grad_norm=1.0, compute_dtype="float32", remat=False,
        vocab_chunk=512, train_modules=(), moe_loss_enable=False,
        dpo_beta=0.1, dpo_loss_type=loss_type, dpo_label_smoothing=0.0)
    state = TrainState.create(params, tcfg)
    step = make_dpo_step(cfg, cfg, tcfg)
    out = []
    for _ in range(STEPS):
        state, metrics = step(state, rparams, batch)
        out.append({k: float(v) for k, v in metrics.items()})
    return out


@pytest.mark.parametrize("loss_type", ["sigmoid", "kto_pair"])
def test_dpo_loss_trajectory_matches_reference_trainer(
        ref_trainer_mod, tmp_path, loss_type):
    """The 2-forward DPO step (policy chosen+rejected in one forward, vs
    the reference's 4 separate forwards, dpo_trainer.py:596-609) must give
    the same 10-step training trajectory under the same AdamW + cosine +
    clipping pipeline.  sigmoid = the DPO default; kto_pair = the recipe
    of record (preference_distillation.sh)."""
    mod = ref_trainer_mod
    student = _tiny_ref_model(mod, 0)
    teacher = _tiny_ref_model(mod, 2)
    arrays = _pref_arrays()

    ours = _our_dpo_trajectory(student, teacher, arrays, loss_type)
    ref = _reference_dpo_trajectory(mod, student, teacher, arrays, tmp_path,
                                    loss_type)

    ref_losses = np.array([h["loss"] for h in ref])
    our_losses = np.array([m["loss"] for m in ours])
    assert ref_losses[-1] < ref_losses[0], ref_losses  # training happens
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1.5e-3,
                               err_msg=f"dpo {loss_type} trajectories")
    for ours_k, ref_k in [("rewards/chosen", "rewards/chosen"),
                          ("rewards/margins", "rewards/margins"),
                          ("logps/chosen", "logps/chosen"),
                          ("logps/rejected", "logps/rejected")]:
        np.testing.assert_allclose(
            np.array([m[ours_k] for m in ours]),
            np.array([h[ref_k] for h in ref]), rtol=2e-3, atol=2e-3,
            err_msg=ours_k)


# ---------------------------------------------------------------------------
# Stage 1: reference LLaVATrainer (llava_trainer.py:152-275) vs our
# make_pretrain_step + per-group optimizer (train/optim.py)
# ---------------------------------------------------------------------------

# tiny CLIP tower: (28/14)^2 = 4 patch tokens per image
P1, TT1 = 4, 29              # patches; pre-splice text length (one <image>)
L1 = TT1 - 1 + P1            # post-splice length = 32
STEPS1, WARMUP1 = 12, 0.25   # 12*0.25 = 3 warmup steps (integral: HF uses
                             # ceil, we use int — only equal when exact)
BASE_LR, PROJ_LR = 1e-3, 5e-4


def _stage1_setup(mod, tmp_path, tune_adapter):
    """Reference model with a real (tiny, local) CLIP tower + projector,
    frozen exactly as train/train.py:478-481 does for stage 1."""
    import transformers as hf

    clip_dir = str(tmp_path / "openai-tiny-clip")  # 'openai' => CLIP branch
    hf_vcfg = hf.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu", layer_norm_eps=1e-5)
    torch.manual_seed(5)
    clip = hf.CLIPVisionModel(hf_vcfg)
    clip.save_pretrained(clip_dir)
    hf.CLIPImageProcessor().save_pretrained(clip_dir)

    student = _tiny_ref_model(mod, 0)
    margs = types.SimpleNamespace(
        image_tower=clip_dir, video_tower=None, mm_vision_select_layer=-2,
        mm_vision_select_feature="patch", pretrain_mm_mlp_adapter=None,
        image_projector_type="mlp2x_gelu", video_projector_type=None,
        video_global_proj=None, video_temproal_proj=None,
        video_spatial_proj=None, s2=False)
    student.get_model().initialize_vision_modules(margs)
    student.config.tune_mm_mlp_adapter = tune_adapter
    if tune_adapter:
        student.requires_grad_(False)
        for p in student.get_model().mm_projector.parameters():
            p.requires_grad = True
    else:
        student.get_model().image_tower.requires_grad_(False)
    return student


def _stage1_arrays():
    """One batch in BOTH layouts: the reference's pre-splice ids (with
    IMAGE_TOKEN_INDEX=-200 at a per-row position) and our static
    post-splice layout (image_mask/image_pos slots), plus shared pixels."""
    rng = np.random.RandomState(3)
    text = rng.randint(5, 500, (B, TT1)).astype(np.int64)
    img_at = np.array([1 + b for b in range(B)])  # varies per row

    ref_ids = text.copy()
    ref_labels = text.copy()
    for b in range(B):
        ref_ids[b, img_at[b]] = -200
        ref_labels[b, img_at[b]] = -100
        ref_labels[b, :min(4 + b, TT1)] = -100  # ragged instruction prefix

    ids = np.zeros((B, L1), np.int32)
    labels = np.full((B, L1), -100, np.int32)
    image_mask = np.zeros((B, L1), bool)
    image_pos = np.zeros((B, L1), np.int32)
    for b in range(B):
        p = img_at[b]
        ids[b, :p] = text[b, :p]
        ids[b, p + P1:] = text[b, p + 1:]
        image_mask[b, p:p + P1] = True
        image_pos[b, p:p + P1] = b * P1 + np.arange(P1)
        lab = ref_labels[b]
        labels[b, :p] = lab[:p]
        labels[b, p + P1:] = lab[p + 1:]
    pixels = rng.randn(B, 1, 3, 28, 28).astype(np.float32)
    return ref_ids, ref_labels, ids, labels, image_mask, image_pos, pixels


def _stage1_ref_trajectory(mod, student, ref_ids, ref_labels, pixels,
                           tmp_path, tune_adapter):
    """Drive the reference LLaVATrainer's real Trainer.train loop (its
    per-group create_optimizer + adapter-only _save_checkpoint)."""
    data = [dict(input_ids=torch.tensor(ref_ids[i]),
                 labels=torch.tensor(ref_labels[i]),
                 attention_mask=torch.ones(TT1, dtype=torch.long),
                 image=torch.tensor(pixels[i, 0]))
            for i in range(B)]

    class DS(torch.utils.data.Dataset):
        def __len__(self):
            return B

        def __getitem__(self, i):
            return data[i]

    def collate(feats):
        out = {k: torch.stack([f[k] for f in feats])
               for k in ("input_ids", "labels", "attention_mask")}
        # reference collator shape: batch['images'] is a flat LIST of
        # [3,H,W] tensors (data/dataset.py:211-226)
        out["images"] = [f["image"] for f in feats]
        return out

    args = mod.TrainingArguments(
        output_dir=str(tmp_path / "ref_s1_out"),
        per_device_train_batch_size=B, max_steps=STEPS1,
        learning_rate=BASE_LR, mm_projector_lr=PROJ_LR,
        weight_decay=0.0, warmup_ratio=WARMUP1,
        lr_scheduler_type="cosine", max_grad_norm=1.0, logging_steps=1,
        save_strategy="steps" if tune_adapter else "no", save_steps=6,
        report_to=[], use_cpu=True, seed=0, remove_unused_columns=False,
        dataloader_num_workers=0)
    args.moe_enable = False
    args.tune_mm_mlp_adapter = tune_adapter

    class Shim(mod.LLaVATrainer):
        """transformers-4.57 call-signature adapter ONLY."""

        def _get_train_sampler(self, dataset=None):  # 4.52+ passes dataset
            return mod.LLaVATrainer._get_train_sampler(self)

    trainer = Shim(model=student, args=args, data_collator=collate,
                   train_dataset=DS())
    trainer.train()
    hist = [h for h in trainer.state.log_history if "loss" in h]
    assert len(hist) == STEPS1
    return hist


def _stage1_our_trajectory(student, arrays, tune_adapter):
    """Same weights/batch through make_pretrain_step + the per-group
    optimizer (train/optim.py mirrors llava_trainer.py:152-239)."""
    from llavamod_tpu.interop.hf import (
        decoder_config_from_hf,
        decoder_params_from_hf,
        projector_params_from_hf,
        vision_params_from_hf,
    )
    from llavamod_tpu.models import llava
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.vision.vit import VisionConfig
    from llavamod_tpu.train.config import TrainConfig
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.steps import batch_from_arrays, make_pretrain_step

    _, _, ids, labels, image_mask, image_pos, pixels = arrays
    dcfg = decoder_config_from_hf(student.config)
    vcfg = VisionConfig(name="openai-tiny-clip", image_size=28, patch_size=14,
                        hidden_size=32, intermediate_size=64, num_layers=3,
                        num_heads=4, patch_bias=False)
    cfg = LlavaConfig(llm=dcfg, vision=vcfg, projector_type="mlp2x_gelu",
                      max_images=1, select_layer=-2, select_feature="patch")
    params = llava.init(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    params["llm"] = decoder_params_from_hf(dict(student.state_dict()), dcfg)
    params["vision"] = vision_params_from_hf(
        dict(student.get_model().image_tower.image_tower.state_dict()), vcfg)
    params["projector"] = projector_params_from_hf(
        dict(student.get_model().mm_projector.state_dict()), "mlp2x_gelu")

    batch = batch_from_arrays({
        "input_ids": ids, "segment_ids": np.ones((B, L1), np.int32),
        "image_mask": image_mask, "image_pos": image_pos,
        "pixels": pixels, "pixel_valid": np.ones((B, 1), bool),
        "labels": labels})

    tcfg = TrainConfig(
        stage="pretrain", optimizer="adamw", learning_rate=BASE_LR,
        mm_projector_lr=PROJ_LR, tune_mm_mlp_adapter=tune_adapter,
        weight_decay=0.0, warmup_ratio=WARMUP1, lr_schedule="cosine",
        total_steps=STEPS1, max_grad_norm=1.0, compute_dtype="float32",
        remat=False, vocab_chunk=512, moe_loss_enable=False)
    state = TrainState.create(params, tcfg)
    step = make_pretrain_step(cfg, tcfg)
    out = []
    for _ in range(STEPS1):
        state, metrics = step(state, batch)
        out.append({k: float(v) for k, v in metrics.items()})
    return out, state


def test_stage1_projector_pretrain_trajectory_and_adapter_save(
        ref_trainer_mod, tmp_path):
    """12 steps of projector-only pretrain (tune_mm_mlp_adapter) with the
    mm_projector_lr per-group override, pinned against the reference's OWN
    LLaVATrainer under Trainer.train — incl. the real multimodal splice +
    frozen CLIP tower + projector gradients — plus the adapter-only
    checkpoint flavor (llava_trainer.py:256-275) byte-key parity."""
    mod = ref_trainer_mod
    student = _stage1_setup(mod, tmp_path, tune_adapter=True)
    arrays = _stage1_arrays()
    ref_ids, ref_labels = arrays[0], arrays[1]

    ours, final_state = _stage1_our_trajectory(student, arrays, True)
    ref = _stage1_ref_trajectory(mod, student, ref_ids, ref_labels,
                                 arrays[6], tmp_path, True)

    ref_losses = np.array([h["loss"] for h in ref])
    our_losses = np.array([m["loss"] for m in ours])
    # only the tiny projector trains — slow but must move measurably
    assert ref_losses[-1] < ref_losses[0] - 0.005, ref_losses
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1.5e-3,
                               err_msg="stage-1 loss trajectories")
    np.testing.assert_allclose(
        np.array([m["grad_norm"] for m in ours]),
        np.array([h["grad_norm"] for h in ref]), rtol=3e-2)

    # adapter-only checkpoints: ONLY config + mm_projector.bin, whose keys
    # are the full reference param names
    import os

    for step_no in (6, 12):
        ck = tmp_path / "ref_s1_out" / f"checkpoint-{step_no}"
        files = set(os.listdir(ck))
        assert "mm_projector.bin" in files, files
        assert not any(f.startswith(("model", "pytorch_model"))
                       for f in files), files
    ref_sd = torch.load(tmp_path / "ref_s1_out" / "checkpoint-12" /
                        "mm_projector.bin", weights_only=True)
    assert all("mm_projector" in k for k in ref_sd)

    # our adapter export after the SAME 12 steps: byte-identical key set,
    # values within trajectory tolerance
    from llavamod_tpu.train.checkpoint import save_mm_projector

    ours_bin = str(tmp_path / "ours_mm_projector.bin")
    save_mm_projector(ours_bin, final_state.params["projector"])
    our_sd = torch.load(ours_bin, weights_only=True)
    assert set(our_sd) == set(ref_sd), (set(our_sd), set(ref_sd))
    for k in ref_sd:
        np.testing.assert_allclose(
            our_sd[k].float().numpy(), ref_sd[k].float().numpy(),
            rtol=5e-3, atol=5e-5, err_msg=k)


def test_stage1_full_sft_mixed_lr_trajectory(ref_trainer_mod, tmp_path):
    """Full SFT (everything trainable but the tower) with mm_projector_lr
    DIFFERENT from the base lr: all four reference optimizer groups
    (decay/no-decay x projector/rest, llava_trainer.py:169-201) are
    non-empty and the two LRs must land on the right params."""
    mod = ref_trainer_mod
    student = _stage1_setup(mod, tmp_path, tune_adapter=False)
    arrays = _stage1_arrays()

    ours, _ = _stage1_our_trajectory(student, arrays, False)
    ref = _stage1_ref_trajectory(mod, student, arrays[0], arrays[1],
                                 arrays[6], tmp_path, False)

    ref_losses = np.array([h["loss"] for h in ref])
    our_losses = np.array([m["loss"] for m in ours])
    assert ref_losses[-1] < ref_losses[0] - 0.05, ref_losses
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1.5e-3,
                               err_msg="stage-1 full-SFT loss trajectories")
    np.testing.assert_allclose(
        np.array([m["grad_norm"] for m in ours]),
        np.array([h["grad_norm"] for h in ref]), rtol=3e-2)
