"""Chunked in-step gradient accumulation (TrainConfig.grad_row_chunks) vs
the one-shot full-batch step.

The chunked path exists for MEMORY (per-chunk residuals instead of the
full-batch working set, so stage-1-shaped configs can drop full remat —
see BENCH_NOTES), but it must be numerically EXACT: CE chunks combine by
token count, the MoE aux loss by chunk mean (guarded on gating groups
tiling the chunk, the same rule as the fused path's microbatching).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llavamod_tpu.models import llava
from llavamod_tpu.models.llava import LlavaConfig
from llavamod_tpu.models.llm.config import DecoderConfig
from llavamod_tpu.models.llm.upcycle import upcycle
from llavamod_tpu.models.vision.vit import VisionConfig
from llavamod_tpu.train.config import TrainConfig
from llavamod_tpu.train.optim import TrainState
from llavamod_tpu.train.steps import batch_from_arrays, make_pretrain_step

pytestmark = pytest.mark.slow  # jit-compile heavy; -m "not slow" skips

jax.config.update("jax_enable_x64", False)


def _setup(moe=False, gating_group=0, dtype=jnp.float32):
    vis = VisionConfig(image_size=28, patch_size=14, hidden_size=32,
                       num_layers=1, num_heads=2, intermediate_size=64)
    llm = DecoderConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=96, num_layers=2,
                        num_heads=2, num_kv_heads=2, head_dim=32)
    cfg = LlavaConfig(llm=llm, vision=vis, projector_type="mlp2x_gelu",
                      max_images=1)
    params = llava.init(cfg, jax.random.PRNGKey(0), dtype=dtype)
    if moe:
        mcfg, mparams = upcycle(cfg.llm, params["llm"], moe_mode="sparse",
                                num_experts=2, top_k=1, capacity_factor=2.0,
                                eval_capacity_factor=2.0)
        mcfg = mcfg.replace(moe_gating_group_size=gating_group)
        cfg = cfg.replace(llm=mcfg)
        params["llm"] = mparams
    # warmup 0 + constant schedule: step 0 applies a full-size update, so
    # one step is enough to prove the chunked gradients are the real ones
    tcfg = TrainConfig(stage="pretrain", learning_rate=1e-2,
                       warmup_ratio=0.0, lr_schedule="constant",
                       total_steps=10, remat=False, vocab_chunk=128,
                       compute_dtype="float32" if dtype == jnp.float32
                       else "bfloat16",
                       param_dtype="float32" if dtype == jnp.float32
                       else "bfloat16")
    return cfg, params, tcfg


def _batch(seed, b=4, t=16, n_img=4):
    rng = np.random.RandomState(seed)
    ids = rng.randint(5, 250, size=(b, t)).astype(np.int32)
    im = np.zeros((b, t), bool)
    im[:, 1:1 + n_img] = True
    ip = np.zeros((b, t), np.int32)
    for i in range(b):
        ip[i, 1:1 + n_img] = i * n_img + np.arange(n_img)
    labels = np.where(im, -100, ids)
    # ragged token counts across rows so the per-chunk CE weighting is
    # actually exercised (equal counts would hide a mean-of-means bug)
    labels[0, t // 2:] = -100
    labels[2, 3 * t // 4:] = -100
    return {
        "input_ids": ids, "segment_ids": np.ones((b, t), np.int32),
        "image_mask": im, "image_pos": ip,
        "pixels": rng.randn(b, 1, 3, 28, 28).astype(np.float32),
        "pixel_valid": np.ones((b, 1), bool),
        "labels": labels}


def _one_step(cfg, params, tcfg, batch):
    state = TrainState.create(jax.tree_util.tree_map(jnp.copy, params),
                              tcfg)
    step = make_pretrain_step(cfg, tcfg)
    state, m = step(state, batch)
    return state.params, {k: float(v) for k, v in m.items()}


@pytest.mark.parametrize("n_ck", [2, 4])
def test_chunked_matches_full_batch_dense(n_ck):
    cfg, params, tcfg = _setup()
    batch = batch_from_arrays(_batch(3))
    p_full, m_full = _one_step(cfg, params, tcfg, batch)
    p_ck, m_ck = _one_step(cfg, params, tcfg.replace(grad_row_chunks=n_ck),
                           batch)
    np.testing.assert_allclose(m_ck["loss"], m_full["loss"], rtol=1e-5)
    np.testing.assert_allclose(m_ck["loss/lm"], m_full["loss/lm"],
                               rtol=1e-5)
    assert m_ck["num_tokens"] == m_full["num_tokens"]
    np.testing.assert_allclose(m_ck["grad_norm"], m_full["grad_norm"],
                               rtol=1e-4)
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_full):
        got = dict(jax.tree_util.tree_leaves_with_path(p_ck))[path]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(leaf, np.float32),
            rtol=1e-3, atol=2.5e-4, err_msg=jax.tree_util.keystr(path))


def test_chunked_matches_full_batch_moe_grouped_gating():
    """Gating groups of one chunk's token count: chunked routing == folded
    routing, so the guard admits the chunked path and it stays exact."""
    cfg, params, tcfg = _setup(moe=True, gating_group=32)  # (4/2)*16 = 32
    tcfg = tcfg.replace(grad_row_chunks=2)
    batch = batch_from_arrays(_batch(7))
    p_full, m_full = _one_step(cfg, params, tcfg.replace(grad_row_chunks=1),
                               batch)
    p_ck, m_ck = _one_step(cfg, params, tcfg, batch)
    np.testing.assert_allclose(m_ck["loss"], m_full["loss"], rtol=1e-5)
    np.testing.assert_allclose(m_ck["loss/moe_balance"],
                               m_full["loss/moe_balance"], rtol=1e-5)
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_full):
        got = dict(jax.tree_util.tree_leaves_with_path(p_ck))[path]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(leaf, np.float32),
            rtol=1e-3, atol=2.5e-4, err_msg=jax.tree_util.keystr(path))


def test_moe_global_gating_falls_back_to_full_batch():
    """Global gating (group 0) pools routing over the whole batch —
    chunking would differentiate a different function, so the step must
    take the one-shot path (bit-identical params to grad_row_chunks=1)."""
    cfg, params, tcfg = _setup(moe=True, gating_group=0)
    batch = batch_from_arrays(_batch(11))
    p_full, _ = _one_step(cfg, params, tcfg, batch)
    p_ck, _ = _one_step(cfg, params, tcfg.replace(grad_row_chunks=2), batch)
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_full):
        got = dict(jax.tree_util.tree_leaves_with_path(p_ck))[path]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(leaf),
                                      err_msg=jax.tree_util.keystr(path))


def test_chunked_empty_chunk_is_exact():
    """A chunk whose rows carry ZERO supervised tokens must contribute zero
    weight — not a floored count of 1 that rescales every other chunk's
    gradient and inflates num_tokens (advisor round-4 finding)."""
    cfg, params, tcfg = _setup()
    d = _batch(13)
    d["labels"][2:4, :] = -100  # second chunk (rows 2-3) fully unsupervised
    batch = batch_from_arrays(d)
    p_full, m_full = _one_step(cfg, params, tcfg, batch)
    p_ck, m_ck = _one_step(cfg, params, tcfg.replace(grad_row_chunks=2),
                           batch)
    assert m_ck["num_tokens"] == m_full["num_tokens"]
    np.testing.assert_allclose(m_ck["loss"], m_full["loss"], rtol=1e-5)
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_full):
        got = dict(jax.tree_util.tree_leaves_with_path(p_ck))[path]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(leaf, np.float32),
            rtol=1e-3, atol=2.5e-4, err_msg=jax.tree_util.keystr(path))
