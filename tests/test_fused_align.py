"""Fused backward+update align step vs the standard grad-then-update path.

The fused step (train/fused_steps.py) must be numerically equivalent to
make_align_step with optimizer='adafactor':
  * the per-leaf Adafactor rule matches optax.adafactor exactly;
  * one fused step produces the same params/metrics as the standard step
    when the stacked layout has reps == 1 (per-repeat blocks == optax's
    per-leaf blocks, so the comparison is apples-to-apples);
  * with reps > 1 the fused loss/grad-norm still match the standard step
    (the update then uses per-LAYER blocks — the original paper's
    granularity — so params are compared against a per-rep-sliced
    reference update, not optax-on-the-whole-stack).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llavamod_tpu.models import llava
from llavamod_tpu.models.llava import LlavaConfig
from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.llm.config import DecoderConfig
from llavamod_tpu.models.llm.upcycle import upcycle
from llavamod_tpu.models.vision.vit import VisionConfig
from llavamod_tpu.train import adafactor
from llavamod_tpu.train.config import TrainConfig
from llavamod_tpu.train.fused_steps import (
    init_fused_state,
    make_fused_align_step,
)
from llavamod_tpu.train.optim import TrainState
from llavamod_tpu.train.steps import batch_from_arrays, make_align_step

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file

jax.config.update("jax_enable_x64", False)


def test_adafactor_leaf_matches_optax():
    rng = np.random.RandomState(0)
    for shape in [(256, 320), (300,), (256, 130, 4)]:
        p = jnp.asarray(rng.randn(*shape), jnp.float32)
        opt = optax.adafactor(learning_rate=0.01)
        st = opt.init(p)
        mine = adafactor.init_leaf(p)
        for step in range(3):
            g = jnp.asarray(rng.randn(*shape), jnp.float32)
            upd, st = opt.update(g, st, p)
            p_opt = optax.apply_updates(p, upd)
            p_mine, mine = adafactor.update_leaf(
                p, g, mine, jnp.asarray(step), jnp.asarray(0.01))
            np.testing.assert_allclose(np.asarray(p_mine),
                                       np.asarray(p_opt),
                                       rtol=1e-5, atol=1e-6)
            p = p_mine


def _tiny_setup(reps, capacity_factor=1.5, gating_group=0,
                train_modules=("/gate", "/up", "/down", "router"),
                tie=False):
    """Tiny MoE student + dense teacher.  reps=1: moe_layers=[1] makes the
    structural period == num_layers; reps=2: 'sparse' every-2nd-layer.
    capacity_factor < 1.5 makes token drops likely (routing-semantics
    tests); gating_group > 0 gates fixed-size token groups independently."""
    vis = VisionConfig(image_size=28, patch_size=14, hidden_size=64,
                      num_layers=2, num_heads=2, intermediate_size=128)
    n_layers = 2 * reps
    llm = DecoderConfig(vocab_size=512, hidden_size=256,
                        intermediate_size=320, num_layers=n_layers,
                        num_heads=4, num_kv_heads=4, head_dim=64,
                        scan_layers=True, tie_word_embeddings=tie)
    cfg = LlavaConfig(llm=llm, vision=vis, projector_type="mlp2x_gelu",
                      max_images=1)
    params = llava.init(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    moe_layers = [1] if reps == 1 else None
    mcfg, mparams = upcycle(cfg.llm, params["llm"],
                            moe_mode="custom" if reps == 1 else "sparse",
                            moe_layers_idx=moe_layers,
                            num_experts=2, top_k=1,
                            capacity_factor=capacity_factor,
                            eval_capacity_factor=2.0)
    mcfg = mcfg.replace(moe_gating_group_size=gating_group)
    cfg = cfg.replace(llm=mcfg)
    params["llm"] = mparams
    # make the router nonzero so it has gradients worth comparing
    for layer in params["llm"]["layers"]:
        if "router" in layer["mlp"]:
            k = jax.random.PRNGKey(7)
            layer["mlp"]["router"] = 0.02 * jax.random.normal(
                k, layer["mlp"]["router"].shape, jnp.bfloat16)
    tcfg = TrainConfig(stage="align", align_loss_type="kd_lm",
                      optimizer="adafactor", learning_rate=1e-2,
                      train_modules=train_modules,
                      total_steps=100, remat=False, vocab_chunk=256,
                      kd_vocab_limit=512, max_grad_norm=0.0)
    teacher = llava.init(cfg.replace(llm=llm), jax.random.PRNGKey(1),
                         dtype=jnp.bfloat16)
    batch = batch_from_arrays(_batch_dict(3))
    return cfg, params, tcfg, teacher, batch


def _batch_dict(seed, b=2, t=16, n_img=4):
    """Collator-style numpy batch dict (the tiny vision tower emits
    n_img=4 tokens per image: 28/14 = 2x2 patches)."""
    rng = np.random.RandomState(seed)
    ids = rng.randint(5, 500, size=(b, t)).astype(np.int32)
    im = np.zeros((b, t), bool)
    im[:, 1:1 + n_img] = True
    ip = np.zeros((b, t), np.int32)
    for i in range(b):
        ip[i, 1:1 + n_img] = i * n_img + np.arange(n_img)
    return {
        "input_ids": ids, "segment_ids": np.ones((b, t), np.int32),
        "image_mask": im, "image_pos": ip,
        "pixels": rng.randn(b, 1, 3, 28, 28).astype(np.float32),
        "pixel_valid": np.ones((b, 1), bool),
        "labels": np.where(im, -100, ids)}


@pytest.mark.parametrize("reps,fused_remat", [
    (1, "repeat"), (2, "repeat"),
    (2, "save_dots"), (2, "save_all"),
])
def test_fused_step_matches_standard(reps, fused_remat):
    cfg, params, tcfg, teacher, batch = _tiny_setup(reps)
    tcfg = tcfg.replace(fused_remat=fused_remat)
    teacher_cfg = cfg.replace(llm=cfg.llm.replace(
        moe_num_experts=0, moe_layers=()))

    # standard path: full-grad-tree + optax.adafactor
    std_state = TrainState.create(params, tcfg)
    std_step = make_align_step(cfg, teacher_cfg, tcfg)
    std_state, std_m = std_step(std_state, teacher, batch)

    # fused path (params donated — rebuild)
    cfg2, params2, *_ = _tiny_setup(reps)
    params2 = dict(params2)
    params2["llm"] = decoder.stack_layers(cfg.llm, params2["llm"])
    f_state = init_fused_state(params2, cfg, tcfg)
    f_step = make_fused_align_step(cfg, teacher_cfg, tcfg)
    f_state, f_m = f_step(f_state, teacher, batch)

    np.testing.assert_allclose(float(f_m["loss"]), float(std_m["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(f_m["loss/align"]),
                               float(std_m["loss/align"]), rtol=1e-5)
    np.testing.assert_allclose(float(f_m["grad_norm"]),
                               float(std_m["grad_norm"]), rtol=2e-2)

    # params after one step: unstack the fused tree and compare leaves
    f_params = dict(f_state.params)
    f_params["llm"] = decoder.unstack_layers(cfg.llm, f_state.params["llm"])
    flat_std = jax.tree_util.tree_leaves_with_path(std_state.params)
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(f_params))
    # the standard path runs on the UNSTACKED tree, so optax's per-leaf
    # blocks are per-layer matrices — the same granularity the fused path
    # uses for any reps; only bf16 rounding order differs
    tol = dict(rtol=2e-2, atol=2e-2)
    for path, leaf in flat_std:
        got = flat_fused[path]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(leaf, np.float32),
            err_msg=jax.tree_util.keystr(path), **tol)


@pytest.mark.parametrize("tie", [False, True])
def test_fused_step_trains_embed_head_final_norm(tie):
    """The fused head/tail sections: unfreezing embed, lm_head and
    final_norm (plus the usual FFN+router set) matches the standard
    grad-then-update path — including the tied-embedding case, where the
    tail's head-matmul dW merges into the embedding's lookup gradient."""
    mods = ("/gate", "/up", "/down", "router", "embed", "final_norm")
    if not tie:
        mods = mods + ("lm_head",)
    cfg, params, tcfg, teacher, batch = _tiny_setup(
        2, train_modules=mods, tie=tie)
    teacher_cfg = cfg.replace(llm=cfg.llm.replace(
        moe_num_experts=0, moe_layers=()))
    emb0 = np.asarray(params["llm"]["embed"]["embedding"], np.float32)

    # 3 steps: the cosine schedule's 3-step warmup makes step 0's lr
    # exactly 0 — one step would compare unmoved params against unmoved
    # params and prove nothing
    std_state = TrainState.create(params, tcfg)
    std_step = make_align_step(cfg, teacher_cfg, tcfg)
    for _ in range(3):
        std_state, std_m = std_step(std_state, teacher, batch)

    _, params2, *_ = _tiny_setup(2, train_modules=mods, tie=tie)
    params2 = dict(params2)
    params2["llm"] = decoder.stack_layers(cfg.llm, params2["llm"])
    f_state = init_fused_state(params2, cfg, tcfg)
    assert "extras" in f_state.opt_state
    f_step = make_fused_align_step(cfg, teacher_cfg, tcfg)
    for _ in range(3):
        f_state, f_m = f_step(f_state, teacher, batch)

    # after 2 prior updates the bf16 params differ by rounding order, so
    # the step-3 losses agree to ~1e-3, not the single-step 1e-5
    np.testing.assert_allclose(float(f_m["loss"]), float(std_m["loss"]),
                               rtol=1e-3)
    np.testing.assert_allclose(float(f_m["grad_norm"]),
                               float(std_m["grad_norm"]), rtol=5e-2)

    f_params = dict(f_state.params)
    f_params["llm"] = decoder.unstack_layers(cfg.llm, f_state.params["llm"])
    # the new sections actually moved
    emb_f = np.asarray(f_params["llm"]["embed"]["embedding"], np.float32)
    assert np.abs(emb_f - emb0).max() > 0
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(f_params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(std_state.params):
        np.testing.assert_allclose(
            np.asarray(flat_fused[path], np.float32),
            np.asarray(leaf, np.float32),
            err_msg=jax.tree_util.keystr(path), rtol=2e-2, atol=2e-2)


def test_fused_step_refuses_trainable_quantized_head():
    cfg, params, tcfg, *_ = _tiny_setup(
        1, train_modules=("/gate", "lm_head"))
    tcfg = tcfg.replace(student_head_quant=True)
    params = dict(params)
    params["llm"] = decoder.stack_layers(cfg.llm, params["llm"])
    with pytest.raises(AssertionError, match="int8 head"):
        init_fused_state(params, cfg, tcfg)


@pytest.mark.parametrize("reps,fused_remat", [
    (1, "repeat"),   # microbatched per-repeat backward (the memory path)
    (2, "repeat"),
    (2, "save_all"),  # folded vjp-residual backward
])
def test_fused_accum_matches_multisteps(reps, fused_remat):
    """In-batch accumulation (grad_accum_steps=2, microbatches folded on
    the batch axis) == the standard path's optax.MultiSteps fed the same
    two microbatches as separate calls: identical params after the update
    and fused loss == mean of the per-microbatch losses."""
    from llavamod_tpu.train.loader import fold_microbatches

    cfg, params, tcfg, teacher, _ = _tiny_setup(reps)
    tcfg = tcfg.replace(grad_accum_steps=2, fused_remat=fused_remat)
    teacher_cfg = cfg.replace(llm=cfg.llm.replace(
        moe_num_experts=0, moe_layers=()))
    d1, d2 = _batch_dict(3), _batch_dict(11)

    # standard path: MultiSteps accumulates the mean grad over 2 calls
    std_state = TrainState.create(params, tcfg)
    std_step = make_align_step(cfg, teacher_cfg, tcfg)
    std_state, m1 = std_step(std_state, teacher, batch_from_arrays(d1))
    std_state, m2 = std_step(std_state, teacher, batch_from_arrays(d2))

    # fused path: ONE call on the folded batch (image_pos re-offset by
    # the loader fold; rows_per_sample = max_images * num_image_tokens)
    (folded,) = list(fold_microbatches(iter([d1, d2]), 2,
                                       rows_per_sample=4))
    np.testing.assert_array_equal(
        folded["image_pos"][2:], d2["image_pos"] + 2 * 4)
    cfg2, params2, *_ = _tiny_setup(reps)
    params2 = dict(params2)
    params2["llm"] = decoder.stack_layers(cfg.llm, params2["llm"])
    f_state = init_fused_state(params2, cfg, tcfg)
    f_step = make_fused_align_step(cfg, teacher_cfg, tcfg)
    f_state, f_m = f_step(f_state, teacher, batch_from_arrays(folded))

    # rtol: bf16 forward at a different batch shape reorders reductions
    np.testing.assert_allclose(
        float(f_m["loss"]),
        (float(m1["loss"]) + float(m2["loss"])) / 2, rtol=1e-4)
    assert float(f_m["num_tokens"]) == (float(m1["num_tokens"])
                                        + float(m2["num_tokens"]))

    f_params = dict(f_state.params)
    f_params["llm"] = decoder.unstack_layers(cfg.llm, f_state.params["llm"])
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(f_params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(std_state.params):
        np.testing.assert_allclose(
            np.asarray(flat_fused[path], np.float32),
            np.asarray(leaf, np.float32),
            err_msg=jax.tree_util.keystr(path), rtol=2e-2, atol=2e-2)


def _fused_accum_run(cfg, tcfg, teacher_cfg, teacher, folded):
    """One fused step on a folded batch from a fresh _tiny_setup tree."""
    _, params, *_ = _tiny_setup(
        2, capacity_factor=cfg.llm.moe_capacity_factor,
        gating_group=cfg.llm.moe_gating_group_size)
    params = dict(params)
    params["llm"] = decoder.stack_layers(cfg.llm, params["llm"])
    state = init_fused_state(params, cfg, tcfg)
    step = make_fused_align_step(cfg, teacher_cfg, tcfg)
    state, m = step(state, teacher, batch_from_arrays(folded))
    out = dict(state.params)
    out["llm"] = decoder.unstack_layers(cfg.llm, state.params["llm"])
    return out, m


def test_fused_accum_moe_global_gating_uses_folded_vjp():
    """MoE + accum>1 + GLOBAL gating (group=0): routing pools capacity
    across the folded microbatches, so the per-microbatch backward would be
    the vjp of a DIFFERENT function.  The 'repeat' policy must warn and fall
    back to the exact folded vjp — pinned here by matching 'save_all'
    (residuals of the folded forward, ground truth) at a capacity that
    actually drops tokens."""
    from llavamod_tpu.train.loader import fold_microbatches

    cfg, _, tcfg, teacher, _ = _tiny_setup(2, capacity_factor=1.0)
    tcfg = tcfg.replace(grad_accum_steps=2)
    teacher_cfg = cfg.replace(llm=cfg.llm.replace(
        moe_num_experts=0, moe_layers=()))
    d1, d2 = _batch_dict(3), _batch_dict(11)
    (folded,) = list(fold_microbatches(iter([d1, d2]), 2, rows_per_sample=4))

    with pytest.warns(UserWarning, match="global gating"):
        p_rep, m_rep = _fused_accum_run(
            cfg, tcfg.replace(fused_remat="repeat"), teacher_cfg, teacher,
            folded)
    p_all, m_all = _fused_accum_run(
        cfg, tcfg.replace(fused_remat="save_all"), teacher_cfg, teacher,
        folded)

    np.testing.assert_allclose(float(m_rep["loss"]), float(m_all["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_rep["grad_norm"]),
                               float(m_all["grad_norm"]), rtol=1e-3)
    flat_all = dict(jax.tree_util.tree_leaves_with_path(p_all))
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_rep):
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32),
            np.asarray(flat_all[path], np.float32),
            err_msg=jax.tree_util.keystr(path), rtol=1e-3, atol=1e-3)

    # the regime is non-vacuous: gating groups aligned to the microbatch
    # route DIFFERENTLY than the folded-global gate at this capacity
    cfg_g, _, _, _, _ = _tiny_setup(2, capacity_factor=1.0, gating_group=16)
    p_grp, m_grp = _fused_accum_run(
        cfg_g, tcfg.replace(fused_remat="repeat"), teacher_cfg, teacher,
        folded)
    assert abs(float(m_grp["loss"]) - float(m_rep["loss"])) > 1e-6, (
        "grouped and global gating agreed — drop-divergence fixture is "
        "vacuous, tighten capacity")


def test_fused_accum_grouped_gating_matches_multisteps_with_drops():
    """Gating groups aligned to the microbatch (group=16 divides the 2x16
    microbatch tokens) make the microbatched per-repeat backward EXACT even
    when tokens are dropped (capacity 1.0): params after one fused folded
    step == optax.MultiSteps fed the same two microbatches separately."""
    from llavamod_tpu.train.loader import fold_microbatches

    cfg, params, tcfg, teacher, _ = _tiny_setup(
        2, capacity_factor=1.0, gating_group=16)
    tcfg = tcfg.replace(grad_accum_steps=2, fused_remat="repeat")
    teacher_cfg = cfg.replace(llm=cfg.llm.replace(
        moe_num_experts=0, moe_layers=()))
    d1, d2 = _batch_dict(3), _batch_dict(11)

    std_state = TrainState.create(params, tcfg)
    std_step = make_align_step(cfg, teacher_cfg, tcfg)
    std_state, m1 = std_step(std_state, teacher, batch_from_arrays(d1))
    std_state, m2 = std_step(std_state, teacher, batch_from_arrays(d2))

    (folded,) = list(fold_microbatches(iter([d1, d2]), 2, rows_per_sample=4))
    f_params, f_m = _fused_accum_run(cfg, tcfg, teacher_cfg, teacher, folded)

    np.testing.assert_allclose(
        float(f_m["loss"]),
        (float(m1["loss"]) + float(m2["loss"])) / 2, rtol=1e-4)
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(f_params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(std_state.params):
        np.testing.assert_allclose(
            np.asarray(flat_fused[path], np.float32),
            np.asarray(leaf, np.float32),
            err_msg=jax.tree_util.keystr(path), rtol=2e-2, atol=2e-2)


def test_fused_step_loss_decreases():
    cfg, params, tcfg, teacher, batch = _tiny_setup(2)
    teacher_cfg = cfg.replace(llm=cfg.llm.replace(
        moe_num_experts=0, moe_layers=()))
    params = dict(params)
    params["llm"] = decoder.stack_layers(cfg.llm, params["llm"])
    state = init_fused_state(params, cfg, tcfg)
    step = make_fused_align_step(cfg, teacher_cfg, tcfg)
    losses = []
    for _ in range(8):
        state, m = step(state, teacher, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_ste_dh_trajectory_tracks_exact():
    """The flagship bench's fast mode (kd_int8_dh + kd_stream_dh over the
    frozen int8 student head) must TRAIN like the exact dequantized-bf16
    dh path: 10 compounding Adafactor steps from identical weights stay
    within ~1% relative loss at every step and keep descending."""
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.steps import make_align_step

    def run(tcfg_extra):
        cfg, params, tcfg, teacher, batch = _tiny_setup(2)
        teacher_cfg = cfg.replace(llm=cfg.llm.replace(
            moe_num_experts=0, moe_layers=()))
        tcfg = tcfg.replace(student_head_quant=True, learning_rate=3e-3,
                            **tcfg_extra)
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params), tcfg)
        step = make_align_step(cfg, teacher_cfg, tcfg)
        losses = []
        for _ in range(10):
            state, m = step(state, teacher, batch)
            losses.append(float(m["loss"]))
        return np.array(losses)

    exact = run(dict(kd_int8_dh=False, kd_stream_dh=False))
    ste = run(dict(kd_int8_dh=True, kd_stream_dh=True))
    assert exact[-1] < exact[0], exact  # training happens
    assert ste[-1] < ste[0], ste
    np.testing.assert_allclose(ste, exact, rtol=1e-2,
                               err_msg="STE-dh vs exact-dh trajectories")
