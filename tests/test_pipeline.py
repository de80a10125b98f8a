"""Pipeline parallelism (parallel/pipeline.py) on the 8 virtual CPU devices.

PP is a beyond-reference extension (the reference disables model
parallelism, builder.py:382-383).  The contract mirrors every other
parallelism test in this suite: the pipelined program must be numerically
the single-device program — the GPipe schedule, the ppermute shifts, and
the bubble masking must not change results, forward or backward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llavamod_tpu.models import llava as llava_mod
from llavamod_tpu.models.llava import LlavaConfig
from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.llm.config import tiny_config
from llavamod_tpu.models.llm.upcycle import upcycle
from llavamod_tpu.models.vision.vit import tiny_vision_config
from llavamod_tpu.parallel.mesh import MeshConfig, make_mesh
from llavamod_tpu.parallel.sharding import shard_batch, shard_params
from llavamod_tpu.train.config import TrainConfig
from llavamod_tpu.train.optim import TrainState
from llavamod_tpu.train.steps import batch_from_arrays, make_align_step

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file


def _dense_llm(num_layers=8):
    cfg = tiny_config(num_layers=num_layers, hidden_size=64,
                      intermediate_size=128, vocab_size=512)
    params = decoder.init(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _moe_llm(num_layers=8, gating_group=32):
    # gating_group = tokens per microbatch: PP gates one microbatch at a
    # time (DeepSpeed per-rank semantics), so a group size dividing the
    # microbatch token count makes PP == sequential bit-identical.
    cfg, params = _dense_llm(num_layers)
    mcfg, mparams = upcycle(cfg, params, moe_mode="sparse", num_experts=4,
                            top_k=2)
    mcfg = mcfg.replace(moe_gating_group_size=gating_group)
    # distinct experts: identical replicas would make routing invisible
    mparams = jax.tree_util.tree_map_with_path(
        lambda p, x: (x + 0.01 * jax.random.normal(
            jax.random.PRNGKey(hash(str(p)) % 2**31), x.shape, x.dtype)
            if "experts" in str(p) else x),
        mparams)
    return mcfg, mparams


def _ids(b=4, t=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(2, 500, size=(b, t)).astype(np.int32))


def _fwd(cfg, params, ids, mesh=None, train=True):
    if mesh is None:
        out = decoder.forward(params, cfg, input_ids=ids, train=train)
        return out.hidden, out.aux_loss
    with jax.set_mesh(mesh):
        p = shard_params(mesh, params)
        out = jax.jit(lambda pp, ii: decoder.forward(
            pp, cfg, input_ids=ii, train=train))(p, ids)
        return jax.device_get(out.hidden), jax.device_get(out.aux_loss)


@pytest.mark.parametrize("axes", [
    dict(pipe=4, data=2),
    dict(pipe=2, data=2, fsdp=2),
])
def test_pipeline_forward_matches_sequential_dense(axes):
    cfg, params = _dense_llm()
    ids = _ids()
    h_ref, _ = _fwd(cfg, params, ids)
    h_pp, _ = _fwd(cfg, params, ids, mesh=make_mesh(MeshConfig(**axes)))
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_forward_matches_sequential_moe():
    cfg, params = _moe_llm()
    ids = _ids()
    h_ref, aux_ref = _fwd(cfg, params, ids)
    mesh = make_mesh(MeshConfig(pipe=2, data=2, expert=2))
    h_pp, aux_pp = _fwd(cfg, params, ids, mesh=mesh)
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    assert float(aux_pp) == pytest.approx(float(aux_ref), rel=1e-5)


def test_pipeline_batch_sharded_boundary():
    # bm = 4 == data*fsdp: exercises the sharded (non-replicated) input
    # canonicalization at the shard_map boundary
    cfg, params = _moe_llm(gating_group=64)
    ids = _ids(b=8)
    h_ref, _ = _fwd(cfg, params, ids)
    h_pp, _ = _fwd(cfg, params, ids,
                   mesh=make_mesh(MeshConfig(pipe=2, data=2, fsdp=2)))
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_microbatch_count_is_respected():
    cfg, params = _dense_llm()
    cfg = cfg.replace(pipeline_microbatches=4)
    ids = _ids(b=4)
    h_ref, _ = _fwd(cfg, params, ids)
    h_pp, _ = _fwd(cfg, params, ids,
                   mesh=make_mesh(MeshConfig(pipe=2, data=2, fsdp=2)))
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential():
    cfg, params = _moe_llm()
    ids = _ids()
    probe = jax.random.normal(jax.random.PRNGKey(7), (4, 16, 64))

    def loss_fn(p, ii):
        out = decoder.forward(p, cfg, input_ids=ii, train=True)
        return (jnp.sum(out.hidden.astype(jnp.float32) * probe)
                + 0.01 * out.aux_loss)

    g_ref = jax.grad(loss_fn)(params, ids)
    mesh = make_mesh(MeshConfig(pipe=2, data=2, expert=2))
    with jax.set_mesh(mesh):
        p = shard_params(mesh, params)
        g_pp = jax.device_get(jax.jit(jax.grad(loss_fn))(p, ids))

    flat_a, _ = jax.tree_util.tree_flatten(g_ref)
    flat_b, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b in zip(flat_a, flat_b):
        # scan-accumulated cotangents + psum reorder float noise: a handful
        # of elements land ~1e-3 off at ~1% relative; everything else <5e-4
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-2, atol=2e-3)


def _tiny_llava(moe, seed=0, num_layers=4):
    llm = tiny_config(num_layers=num_layers, hidden_size=64,
                      intermediate_size=128, vocab_size=512)
    cfg = LlavaConfig(llm=llm, vision=tiny_vision_config(hidden_size=32),
                      projector_type="mlp2x_gelu", max_images=1)
    params = llava_mod.init(cfg, jax.random.PRNGKey(seed))
    if moe:
        mcfg, mparams = upcycle(cfg.llm, params["llm"], moe_mode="sparse",
                                num_experts=4, top_k=2)
        # 64 = tokens per pipeline microbatch (b=4/m=2 -> bm=2, t=32):
        # matched gating groups make PP == sequential (see _moe_llm)
        cfg = cfg.replace(llm=mcfg.replace(moe_gating_group_size=64))
        params["llm"] = mparams
    return cfg, params


def _batch(cfg, b=4, t=32, seed=0):
    rng = np.random.default_rng(seed)
    n = cfg.num_image_tokens
    ids = rng.integers(2, 500, size=(b, t)).astype(np.int32)
    image_mask = np.zeros((b, t), bool)
    image_mask[:, 1:1 + n] = True
    image_pos = np.zeros((b, t), np.int32)
    for i in range(b):
        image_pos[i, 1:1 + n] = i * n + np.arange(n)
    labels = np.where(image_mask, -100, ids).astype(np.int32)
    s = cfg.vision.image_size
    return {
        "input_ids": ids,
        "segment_ids": np.ones((b, t), np.int32),
        "image_mask": image_mask,
        "image_pos": image_pos,
        "pixels": rng.normal(size=(b, 1, 3, s, s)).astype(np.float32),
        "pixel_valid": np.ones((b, 1), bool),
        "labels": labels,
    }


def test_pipeline_align_step_matches_single_device():
    tcfg = TrainConfig(stage="align", align_loss_type="kd_lm",
                       compute_dtype="float32", remat=False,
                       vocab_chunk=256, total_steps=10, max_grad_norm=1.0,
                       train_modules=("/gate", "/up", "/down", "router"))
    batch = _batch(_tiny_llava(moe=True)[0])

    def run(mesh):
        s_cfg, s_params = _tiny_llava(moe=True)
        t_cfg, t_params = _tiny_llava(moe=False, seed=3)
        if mesh is None:
            state = TrainState.create(s_params, tcfg)
            step = make_align_step(s_cfg, t_cfg, tcfg)
            state, metrics = step(state, t_params,
                                  batch_from_arrays(batch))
            return state, metrics
        with jax.set_mesh(mesh):
            sp = shard_params(mesh, s_params)
            tp = shard_params(mesh, t_params)
            bd = shard_batch(mesh, batch)
            state = TrainState.create(sp, tcfg)
            step = make_align_step(s_cfg, t_cfg, tcfg)
            state, metrics = step(state, tp, batch_from_arrays(bd))
            return jax.device_get(state), jax.device_get(metrics)

    st_ref, m_ref = run(None)
    mesh = make_mesh(MeshConfig(pipe=2, data=2, fsdp=2))
    st_pp, m_pp = run(mesh)

    for k in ("loss", "loss/align", "loss/lm", "loss/moe_balance"):
        assert float(m_ref[k]) == pytest.approx(float(m_pp[k]), rel=3e-4), (
            k, float(m_ref[k]), float(m_pp[k]))
    flat_a = jax.tree_util.tree_leaves(st_ref.params)
    flat_b = jax.tree_util.tree_leaves(st_pp.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=1e-5)


def test_pipeline_flash_attention_t1024():
    """Pallas flash attention INSIDE the pipe-manual region (VERDICT
    round-3 #5): ops/attention.py::_flash_under_mesh re-enters a nested
    shard_map over the non-Manual axes (batch over 'data', heads over
    'tensor'), so the kernel never sits in an auto-GSPMD region.  T=1024
    = real flash tiles (2x the 512 block); dh=64 (the kernel's minimum
    lane quantum); interpret mode on the CPU devices."""
    cfg = tiny_config(num_layers=4, hidden_size=256, num_heads=4,
                      num_kv_heads=4, intermediate_size=192,
                      vocab_size=512, scan_layers=True)
    params = decoder.init(cfg, jax.random.PRNGKey(0))
    ids = _ids(b=2, t=1024)

    out = decoder.forward(params, cfg, input_ids=ids, train=True,
                          attn_impl="flash")
    h_ref = np.asarray(out.hidden)

    mesh = make_mesh(MeshConfig(pipe=2, data=2, tensor=2))
    with jax.set_mesh(mesh):
        p = shard_params(mesh, params)
        out_pp = jax.jit(lambda pp, ii: decoder.forward(
            pp, cfg, input_ids=ii, train=True, attn_impl="flash"))(p, ids)
        h_pp = jax.device_get(out_pp.hidden)
    np.testing.assert_allclose(h_pp, h_ref, rtol=2e-5, atol=2e-5)


def test_flash_attention_under_gspmd_mesh():
    """The same nested-shard_map wrapper makes the training flash kernel
    legal under a plain GSPMD mesh (no pipe): batch over data/fsdp, heads
    over tensor, bit-matching the unsharded kernel."""
    cfg = tiny_config(num_layers=2, hidden_size=256, num_heads=4,
                      num_kv_heads=4, intermediate_size=192,
                      vocab_size=512, scan_layers=True)
    params = decoder.init(cfg, jax.random.PRNGKey(1))
    ids = _ids(b=4, t=256, seed=3)

    out = decoder.forward(params, cfg, input_ids=ids, train=True,
                          attn_impl="flash")
    h_ref = np.asarray(out.hidden)

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    with jax.set_mesh(mesh):
        p = shard_params(mesh, params)
        out_m = jax.jit(lambda pp, ii: decoder.forward(
            pp, cfg, input_ids=ii, train=True, attn_impl="flash"))(p, ids)
        h_m = jax.device_get(out_m.hidden)
    np.testing.assert_allclose(h_m, h_ref, rtol=2e-5, atol=2e-5)


def test_pipeline_requires_divisible_batch():
    cfg, params = _dense_llm()
    ids = _ids(b=3)
    with pytest.raises(AssertionError, match="microbatch"):
        _fwd(cfg, params, ids, mesh=make_mesh(MeshConfig(pipe=2, data=2,
                                                         fsdp=2)))
