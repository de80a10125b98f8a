"""End-to-end tests of the train entry points (tiny models, 8-CPU mesh).

Covers the full 3-stage recipe through llavamod_tpu.train.run.run_stage —
the equivalent of driving the reference's train.py / align_train.py /
dpo_train.py (SURVEY.md §2.13) — including native checkpoint save/load
between stages, MoE upcycling inside the align stage, and stage-1
mm_projector.bin export."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from llavamod_tpu.models import llava as llava_mod
from llavamod_tpu.models.builder import load_model, save_model
from llavamod_tpu.models.llava import LlavaConfig
from llavamod_tpu.models.llm.config import tiny_config
from llavamod_tpu.models.vision.vit import tiny_vision_config
from llavamod_tpu.train.args import AlignArgs, DataArgs, DPOArgs, ModelArgs, TrainArgs
from llavamod_tpu.train.run import run_stage

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file


@pytest.fixture(scope="module", autouse=True)
def _no_compile_cache():
    """jax 0.9.0's CPU persistent-cache DESERIALIZATION aborts (bare
    SIGABRT inside the first metrics fetch, no error text) on one of this
    module's jitted train steps when the entry is re-loaded warm — cold
    compiles of the identical program are fine.  Opt this module out of
    the persistent cache (conftest.py enables it suite-wide)."""
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", old)


class StubTok:
    bos_token_id = None
    pad_token_id = 0

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [ord(c) % 500 for c in text]
        return r


def _tiny_model_dir(tmp_path):
    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu", max_images=1)
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    d = str(tmp_path / "base_model")
    save_model(d, cfg, params)
    return d, cfg


def _write_data(tmp_path, n=16, dpo=False):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    records = []
    for i in range(n):
        name = f"img{i}.png"
        Image.new("RGB", (32, 32), (i * 10 % 255, 30, 40)).save(img_dir / name)
        human = {"from": "human", "value": "<image>\nwhat is this?"}
        if dpo:
            rec = {
                "id": i,
                "image": name,
                "chosen": [human, {"from": "gpt", "value": f"a red bus {i}"}],
                "rejected": [human, {"from": "gpt", "value": "nothing"}],
            }
        else:
            rec = {"id": i, "image": name, "conversations": [
                human, {"from": "gpt", "value": f"a red bus {i}"}]}
        if not dpo and i % 4 == 3:  # some text-only samples
            rec = {"id": i, "conversations": [
                {"from": "human", "value": "hi"},
                {"from": "gpt", "value": "hello there"}]}
        records.append(rec)
    path = tmp_path / ("dpo.json" if dpo else "sft.json")
    path.write_text(json.dumps(records))
    return str(path), str(img_dir)


def _targs(out, **kw):
    base = dict(output_dir=out, per_device_train_batch_size=8,
                max_steps=2, logging_steps=1, save_steps=100,
                model_max_length=64, dataloader_num_workers=0,
                compute_dtype="float32", remat=False, vocab_chunk=128,
                learning_rate=1e-3, warmup_ratio=0.0)
    base.update(kw)
    return TrainArgs(**base)


@pytest.fixture(scope="module")
def stage_dirs(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("run3stage")
    model_dir, _ = _tiny_model_dir(tmp_path)
    data, imgs = _write_data(tmp_path)
    return tmp_path, model_dir, data, imgs


def test_stage1_pretrain(stage_dirs):
    tmp_path, model_dir, data, imgs = stage_dirs
    out = str(tmp_path / "out1")
    metrics = run_stage(
        "pretrain",
        ModelArgs(model_name_or_path=model_dir, version="plain",
                  tune_mm_mlp_adapter=True),
        DataArgs(data_path=[data], image_folder=imgs),
        _targs(out), tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])
    assert os.path.exists(os.path.join(out, "mm_projector.bin"))
    cfg2, params2 = load_model(out)
    assert "projector" in params2


def test_stage2_align_sparse(stage_dirs):
    tmp_path, model_dir, data, imgs = stage_dirs
    stage1 = str(tmp_path / "out1")
    assert os.path.isdir(stage1), "stage1 test must run first"
    out = str(tmp_path / "out2")
    metrics = run_stage(
        "align",
        ModelArgs(model_name_or_path=stage1, version="qwen", moe_enable=True,
                  moe_mode="sparse", num_experts=4, top_k_experts=2,
                  train_modules=["mlp.gate_proj", "mlp.up_proj",
                                 "mlp.down_proj", "wg"]),
        DataArgs(data_path=[data], image_folder=imgs),
        _targs(out, group_by_modality_length=True, model_max_length=256),
        salign=AlignArgs(policy_model_type="sparse",
                         ref_model_name_or_path=model_dir,
                         loss_type="kd_lm", moe_loss_enable=True),
        tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])
    assert "loss/align" in metrics and "loss/moe_balance" in metrics
    cfg2, _ = load_model(out)
    assert cfg2.llm.is_moe and cfg2.llm.moe_layers == (0,)


def test_stage3_dpo(stage_dirs):
    tmp_path, model_dir, data, imgs = stage_dirs
    stage2 = str(tmp_path / "out2")
    assert os.path.isdir(stage2), "stage2 test must run first"
    dpo_data, _ = _write_data(tmp_path, n=16, dpo=True)
    out = str(tmp_path / "out3")
    metrics = run_stage(
        "dpo",
        ModelArgs(model_name_or_path=stage2, version="qwen"),
        DataArgs(data_path=[dpo_data], image_folder=imgs),
        _targs(out, model_max_length=256),
        sdpo=DPOArgs(loss_type="kto_pair",
                     ref_model_name_or_path=model_dir),
        tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])
    assert "rewards/accuracies" in metrics


def test_align_with_lora(stage_dirs, tmp_path):
    _, model_dir, data, imgs = stage_dirs
    out = str(tmp_path / "out_lora")
    metrics = run_stage(
        "align",
        ModelArgs(model_name_or_path=model_dir, version="qwen",
                  moe_enable=True, lora_enable=True, lora_r=4, lora_alpha=8,
                  train_modules=["wg"]),
        DataArgs(data_path=[data], image_folder=imgs),
        _targs(out, max_steps=1, model_max_length=256),
        salign=AlignArgs(policy_model_type="sparse",
                         ref_model_name_or_path=model_dir),
        tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])
    # PEFT-format adapter export exists and round-trips
    adapter = os.path.join(out, "adapter")
    assert os.path.exists(os.path.join(adapter, "adapter_model.bin"))
    assert os.path.exists(os.path.join(adapter, "adapter_config.json"))


def test_auto_resume(stage_dirs):
    tmp_path, model_dir, data, imgs = stage_dirs
    out = str(tmp_path / "out_resume")
    targs = _targs(out, max_steps=2, save_steps=1)
    margs = ModelArgs(model_name_or_path=model_dir, version="plain",
                      tune_mm_mlp_adapter=True)
    dargs = DataArgs(data_path=[data], image_folder=imgs)
    run_stage("pretrain", margs, dargs, targs, tokenizer=StubTok())
    assert os.path.isdir(os.path.join(out, "checkpoint-1"))
    # second run resumes from checkpoint-1 and continues to max_steps=3
    targs2 = _targs(out, max_steps=3, save_steps=1)
    run_stage("pretrain", margs, dargs, targs2, tokenizer=StubTok())
    assert os.path.isdir(os.path.join(out, "checkpoint-2"))


def test_align_with_int8_teacher(stage_dirs, tmp_path):
    _, model_dir, data, imgs = stage_dirs
    out = str(tmp_path / "out_int8t")
    metrics = run_stage(
        "align",
        ModelArgs(model_name_or_path=model_dir, version="qwen"),
        DataArgs(data_path=[data], image_folder=imgs),
        _targs(out, max_steps=1, model_max_length=256),
        salign=AlignArgs(policy_model_type="dense",
                         ref_model_name_or_path=model_dir,
                         ref_quant="int8"),
        tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])


def test_align_fused_adafactor(stage_dirs, tmp_path):
    """--optimizer adafactor --fused_update: the record-train-set memory
    path (per-repeat updates inside the backward scan) through the real
    align entry — trains, checkpoints, and the FFNs actually move."""
    _, model_dir, data, imgs = stage_dirs
    out = str(tmp_path / "out_fused")
    cfg0, params0 = load_model(model_dir)
    metrics = run_stage(
        "align",
        ModelArgs(model_name_or_path=model_dir, version="qwen",
                  moe_enable=True, moe_mode="sparse", num_experts=2,
                  top_k_experts=1,
                  train_modules=["mlp.gate_proj", "mlp.up_proj",
                                 "mlp.down_proj", "wg"]),
        DataArgs(data_path=[data], image_folder=imgs),
        _targs(out, model_max_length=256, optimizer="adafactor",
               fused_update=True, learning_rate=1e-2),
        salign=AlignArgs(policy_model_type="sparse",
                         ref_model_name_or_path=model_dir,
                         loss_type="kd_lm", moe_loss_enable=True),
        tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])
    assert "loss/align" in metrics and "grad_norm" in metrics
    cfg2, params2 = load_model(out)
    assert cfg2.llm.is_moe
    before = np.asarray(params0["llm"]["layers"][1]["mlp"]["up"],
                        np.float32)
    after = np.asarray(params2["llm"]["layers"][1]["mlp"]["up"], np.float32)
    assert np.abs(after - before).max() > 0  # dense-layer FFN trained
    ex = params2["llm"]["layers"][0]["mlp"]
    assert "experts" in ex
    e_before = np.asarray(params0["llm"]["layers"][0]["mlp"]["up"],
                          np.float32)
    e_after = np.asarray(ex["experts"]["up"], np.float32)
    assert np.abs(e_after - e_before[None]).max() > 0  # experts trained


def test_align_fused_with_grad_accum(stage_dirs, tmp_path):
    """--fused_update + gradient_accumulation_steps=2: run.py folds the
    microbatches into the batch axis (train/loader.py::fold_microbatches)
    and one fused call = one optimizer step over both (the recipe of
    record runs accumulation 8, dense2sparse_distillation.sh:72)."""
    _, model_dir, data, imgs = stage_dirs
    out = str(tmp_path / "out_fused_accum")
    metrics = run_stage(
        "align",
        ModelArgs(model_name_or_path=model_dir, version="qwen",
                  moe_enable=True, moe_mode="sparse", num_experts=2,
                  top_k_experts=1,
                  train_modules=["mlp.gate_proj", "mlp.up_proj",
                                 "mlp.down_proj", "wg"]),
        DataArgs(data_path=[data], image_folder=imgs),
        _targs(out, model_max_length=256, optimizer="adafactor",
               fused_update=True, learning_rate=1e-2,
               gradient_accumulation_steps=2),
        salign=AlignArgs(policy_model_type="sparse",
                         ref_model_name_or_path=model_dir,
                         loss_type="kd_lm", moe_loss_enable=True),
        tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])
    from llavamod_tpu.models.builder import load_model as _lm
    cfg2, _ = _lm(out)
    assert cfg2.llm.is_moe


def test_pretrain_stage_full_sft_when_flag_off(stage_dirs, tmp_path):
    """tune_mm_mlp_adapter=false through train.py = full SFT (reference
    train/train.py semantics: the flag drives freezing, not the script)."""
    _, model_dir, data, imgs = stage_dirs
    out = str(tmp_path / "out_sft")
    from llavamod_tpu.models.builder import load_model

    cfg0, params0 = load_model(model_dir)
    metrics = run_stage(
        "pretrain",
        ModelArgs(model_name_or_path=model_dir, version="qwen",
                  tune_mm_mlp_adapter=False),
        DataArgs(data_path=[data], image_folder=imgs),
        _targs(out, max_steps=1, model_max_length=256), tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])
    _, params1 = load_model(out)
    before = np.asarray(params0["llm"]["layers"][0]["mlp"]["up"])
    after = np.asarray(params1["llm"]["layers"][0]["mlp"]["up"])
    assert np.abs(after - before).max() > 0  # LLM actually trained


def test_policy_head_quant_requires_frozen_head():
    """--policy_head_quant without explicit train_modules must refuse
    (quantizing a trained head would silently stop its gradients)."""
    from llavamod_tpu.train.args import (AlignArgs, ModelArgs, TrainArgs,
                                         train_config_from_args)

    with pytest.raises(ValueError, match="train_modules"):
        train_config_from_args("align", TrainArgs(output_dir="/tmp/x"),
                               total_steps=10,
                               model_args=ModelArgs(),
                               align=AlignArgs(policy_head_quant=True))
    # with the recipe-of-record freeze list it passes through
    tcfg = train_config_from_args(
        "align", TrainArgs(output_dir="/tmp/x"), total_steps=10,
        model_args=ModelArgs(train_modules=["mlp.gate_proj", "wg"]),
        align=AlignArgs(policy_head_quant=True))
    assert tcfg.student_head_quant


def test_pretrain_step_converges_on_fixed_batch():
    """25 steps on one repeated tiny batch must drive the CE loss down
    substantially — end-to-end evidence that grads/optimizer/LR schedule
    actually learn (not just 'loss is finite')."""
    import jax
    import numpy as np

    from llavamod_tpu.models import llava as llava_mod
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import tiny_config
    from llavamod_tpu.models.vision.vit import tiny_vision_config
    from llavamod_tpu.train.config import TrainConfig
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.steps import batch_from_arrays, make_pretrain_step

    cfg = LlavaConfig(llm=tiny_config(num_layers=2, hidden_size=64,
                                      intermediate_size=128, vocab_size=256),
                      vision=tiny_vision_config(hidden_size=32),
                      projector_type="mlp2x_gelu", max_images=1)
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    tcfg = TrainConfig(stage="pretrain", compute_dtype="float32", remat=False,
                       vocab_chunk=128, total_steps=25, learning_rate=5e-3,
                       warmup_ratio=0.0, lr_schedule="constant")
    state = TrainState.create(params, tcfg)
    step = make_pretrain_step(cfg, tcfg)

    rng = np.random.default_rng(0)
    b, t, n = 2, 32, cfg.num_image_tokens
    ids = rng.integers(2, 250, size=(b, t)).astype(np.int32)
    image_mask = np.zeros((b, t), bool)
    image_mask[:, 1:1 + n] = True
    image_pos = np.zeros((b, t), np.int32)
    for i in range(b):
        image_pos[i, 1:1 + n] = i * n + np.arange(n)
    labels = np.where(image_mask, -100, ids).astype(np.int32)
    s = cfg.vision.image_size
    batch = batch_from_arrays({
        "input_ids": ids, "segment_ids": np.ones((b, t), np.int32),
        "image_mask": image_mask, "image_pos": image_pos,
        "pixels": rng.normal(size=(b, 1, 3, s, s)).astype(np.float32),
        "pixel_valid": np.ones((b, 1), bool), "labels": labels,
    })

    first = None
    for _ in range(25):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.6 * first, (first, last)


def test_align_with_policy_head_quant_prequantizes_and_exports_float(stage_dirs):
    """End-to-end align with --policy_head_quant: the head is pre-quantized
    outside the step (run.py stash) and the EXPORTED checkpoint carries the
    original float head, not the int8 training stand-in."""
    tmp_path, model_dir, data, imgs = stage_dirs
    stage1 = str(tmp_path / "out1")
    out = str(tmp_path / "out_hq")
    metrics = run_stage(
        "align",
        ModelArgs(model_name_or_path=stage1, version="qwen", moe_enable=True,
                  moe_mode="sparse", num_experts=4, top_k_experts=2,
                  train_modules=["mlp.gate_proj", "mlp.up_proj",
                                 "mlp.down_proj", "wg"]),
        DataArgs(data_path=[data], image_folder=imgs),
        _targs(out, model_max_length=256),
        salign=AlignArgs(policy_model_type="sparse",
                         ref_model_name_or_path=model_dir,
                         policy_head_quant=True),
        tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])
    cfg2, params2 = load_model(out)
    head = params2["llm"].get("lm_head")
    if head is not None:  # untied student: float head restored on export
        w = head["weight"]
        assert not isinstance(w, dict), "int8 stand-in leaked into export"
        assert np.asarray(w).dtype != np.int8

def test_align_with_policy_body_quant(stage_dirs):
    """End-to-end align with --policy_body_quant (router-only train set):
    the frozen body trains as int8 W8A8, the loss is finite, and the
    exported checkpoint carries the float body with the TRAINED router
    grafted back (not the int8 stand-in)."""
    tmp_path, model_dir, data, imgs = stage_dirs
    stage1 = str(tmp_path / "out1")
    out = str(tmp_path / "out_bq")
    metrics = run_stage(
        "align",
        ModelArgs(model_name_or_path=stage1, version="qwen", moe_enable=True,
                  moe_mode="sparse", num_experts=4, top_k_experts=2,
                  train_modules=["wg"]),
        DataArgs(data_path=[data], image_folder=imgs),
        _targs(out, model_max_length=256),
        salign=AlignArgs(policy_model_type="sparse",
                         ref_model_name_or_path=model_dir,
                         policy_body_quant=True),
        tokenizer=StubTok())
    assert np.isfinite(metrics["loss"])
    cfg2, params2 = load_model(out)
    for layer in params2["llm"]["layers"]:
        for k in ("wq", "wk", "wv", "wo"):
            w = layer["attn"][k]
            assert not isinstance(w, dict), "int8 stand-in leaked into export"
        mlp = layer["mlp"]
        if "experts" in mlp:
            assert not any(isinstance(v, dict) for v in mlp["experts"].values())
            assert "router" in mlp and not isinstance(mlp["router"], dict)


def test_policy_body_quant_requires_frozen_body(stage_dirs):
    """--policy_body_quant with a train set that trains FFN weights must be
    refused (verified against the actual trainable mask, not the flag list)."""
    tmp_path, model_dir, data, imgs = stage_dirs
    stage1 = str(tmp_path / "out1")
    out = str(tmp_path / "out_bq_bad")
    with pytest.raises(ValueError, match="policy_body_quant"):
        run_stage(
            "align",
            ModelArgs(model_name_or_path=stage1, version="qwen",
                      moe_enable=True, moe_mode="sparse", num_experts=4,
                      top_k_experts=2,
                      train_modules=["mlp.gate_proj", "mlp.up_proj",
                                     "mlp.down_proj", "wg"]),
            DataArgs(data_path=[data], image_folder=imgs),
            _targs(out, model_max_length=256),
            salign=AlignArgs(policy_model_type="sparse",
                             ref_model_name_or_path=model_dir,
                             policy_body_quant=True),
            tokenizer=StubTok())
