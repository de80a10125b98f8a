"""Video projector vs a loop-assembled torch oracle.

The oracle mirrors the reference semantics (multimodal_projector/
builder.py:152-198): per-frame token blocks assembled with Python loops —
[global?][patches][temporal?] per frame, spatial summary appended after the
last frame — while the repo path is one static concatenation.  Exact
agreement in fp32 is required.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from llavamod_tpu.models.video import (VideoProjectorConfig,
                                       build_video_projector)


def _torch_mlp(p, x):
    """Reference MLP (builder.py:113-124): Linear-GELU(exact)-Linear."""
    x = x @ torch.tensor(np.asarray(p["layers"][0]["kernel"], np.float64))
    x = x + torch.tensor(np.asarray(p["layers"][0]["bias"], np.float64))
    x = torch.nn.functional.gelu(x)
    x = x @ torch.tensor(np.asarray(p["layers"][1]["kernel"], np.float64))
    return x + torch.tensor(np.asarray(p["layers"][1]["bias"], np.float64))


def _torch_linear(p, x):
    return (x @ torch.tensor(np.asarray(p["kernel"], np.float64))
            + torch.tensor(np.asarray(p["bias"], np.float64)))


def _oracle(cfg, params, feats):
    """Loop assembly exactly as builder.py:160-187 orders tokens."""
    f = torch.tensor(np.asarray(feats, np.float64))
    cls, patches = f[:, :, 0, :], f[:, :, 1:, :]
    b, t, n, _ = patches.shape
    out_rows = []
    proj = _torch_linear(params["patch"], patches)     # linear patch proj
    for i in range(b):
        toks = []
        for j in range(t):
            block = [proj[i, j]]
            if cfg.temporal_proj:
                block.append(_torch_mlp(params["temporal"],
                                        patches[i, j].mean(0))[None, :])
            if cfg.global_proj:
                block.insert(0, _torch_mlp(params["global"],
                                           cls[i, j])[None, :])
            if cfg.spatial_proj and j + 1 == t:
                block.append(_torch_mlp(params["spatial"],
                                        patches[i].mean(0)))
            toks.append(torch.cat(block, dim=0))
        out_rows.append(torch.cat(toks, dim=0))
    return torch.stack(out_rows).numpy()


@pytest.mark.parametrize("flags", [
    (False, False, False),
    (True, False, False),
    (False, True, False),
    (False, False, True),
    (True, True, True),
])
def test_video_projector_matches_loop_oracle(flags):
    g, tp, sp = flags
    cfg = VideoProjectorConfig(projector_type="linear", global_proj=g,
                               temporal_proj=tp, spatial_proj=sp)
    vp = build_video_projector(cfg, vision_dim=12, llm_dim=16)
    params = vp.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    feats = np.random.RandomState(0).randn(2, 3, 1 + 9, 12).astype(np.float32)

    got = np.asarray(vp.apply(params, jnp.asarray(feats)))
    want = _oracle(cfg, params, feats)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got.shape[1] == vp.num_output_tokens(3, 9)


def test_video_projector_pooling_patch_spec():
    """Any registry spec drives the patch path (builder.py:69-110); pooling
    reduces the per-frame grid 4x, summaries unaffected."""
    cfg = VideoProjectorConfig(projector_type="pool_mlp2x_gelu",
                               global_proj=True, temporal_proj=True)
    vp = build_video_projector(cfg, vision_dim=12, llm_dim=16)
    params = vp.init(jax.random.PRNGKey(1))
    feats = jnp.asarray(
        np.random.RandomState(1).randn(1, 2, 1 + 16, 12), jnp.float32)
    out = vp.apply(params, feats)
    assert out.shape == (1, 2 * (16 // 4 + 2), 16)
    assert out.shape[1] == vp.num_output_tokens(2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_video_projector_jit_and_grad():
    cfg = VideoProjectorConfig(projector_type="mlp2x_gelu", global_proj=True,
                               temporal_proj=True, spatial_proj=True)
    vp = build_video_projector(cfg, vision_dim=8, llm_dim=8)
    params = vp.init(jax.random.PRNGKey(2))
    feats = jnp.asarray(np.random.RandomState(2).randn(2, 2, 5, 8),
                        jnp.float32)

    loss = jax.jit(lambda p: (vp.apply(p, feats) ** 2).mean())
    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
