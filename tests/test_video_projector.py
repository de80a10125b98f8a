"""Video projector (reference builder.py:69-198 forward_video parity).

Checks the static token layout against the reference's ragged-list
semantics: per frame [global?][patches][temporal?], spatial tail appended
once, and a torch oracle for the numeric path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llavamod_tpu.models.video_projector import (
    VideoProjectorConfig,
    forward_video,
    init,
)


def _cfg(**kw):
    base = dict(video_projector_type="linear", vision_dim=16, llm_dim=24)
    base.update(kw)
    return VideoProjectorConfig(**base)


def test_patch_only_layout():
    cfg = _cfg()
    params = init(cfg, jax.random.PRNGKey(0))
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 3, 5, 16),
                        jnp.float32)  # B=2, T=3, 1+N=5
    out = forward_video(params, cfg, feats)
    assert out.shape == (2, cfg.tokens_per_clip(3, 4), 24)
    assert out.shape[1] == 3 * 4  # patches only

    # frame j's tokens are the projected patches of frame j
    w, bias = params["patch"]["kernel"], params["patch"]["bias"]
    want = np.asarray(feats[:, 1, 1:, :] @ w + bias)
    np.testing.assert_allclose(np.asarray(out[:, 4:8]), want, rtol=1e-5)


def test_all_aux_projs_layout():
    cfg = _cfg(spatial_proj=True, temporal_proj=True, global_proj=True)
    params = init(cfg, jax.random.PRNGKey(1))
    b, t, n = 2, 3, 4
    feats = jnp.asarray(np.random.RandomState(1).randn(b, t, 1 + n, 16),
                        jnp.float32)
    out = forward_video(params, cfg, feats)
    per_frame = 1 + n + 1  # global + patches + temporal
    assert out.shape == (b, t * per_frame + n, 24)
    assert out.shape[1] == cfg.tokens_per_clip(t, n)


def test_torch_oracle_parity():
    """Numeric parity of every sub-projection against a direct torch
    transcription of the reference math (global/temporal/spatial MLPs,
    linear patch proj, frame concat order)."""
    torch = pytest.importorskip("torch")

    cfg = _cfg(spatial_proj=True, temporal_proj=True, global_proj=True)
    params = init(cfg, jax.random.PRNGKey(2))
    b, t, n = 1, 2, 4
    rng = np.random.RandomState(2)
    feats = rng.randn(b, t, 1 + n, 16).astype(np.float32)

    out = np.asarray(forward_video(params, cfg, jnp.asarray(feats)))

    def mlp2(p, x):
        x = torch.tensor(x)
        h = x @ torch.tensor(np.asarray(p["fc1"]["kernel"])) + torch.tensor(
            np.asarray(p["fc1"]["bias"]))
        h = torch.nn.functional.gelu(h)
        return (h @ torch.tensor(np.asarray(p["fc2"]["kernel"]))
                + torch.tensor(np.asarray(p["fc2"]["bias"]))).numpy()

    gfeat, pfeat = feats[:, :, 0, :], feats[:, :, 1:, :]
    patches = (pfeat @ np.asarray(params["patch"]["kernel"])
               + np.asarray(params["patch"]["bias"]))
    glob = mlp2(params["global"], gfeat)          # [B, T, D]
    temp = mlp2(params["temporal"], pfeat.mean(2))  # [B, T, D]
    spat = mlp2(params["spatial"], pfeat.mean(1))   # [B, N, D]

    rows = []
    for j in range(t):  # reference frame order: [global, patches, temporal]
        rows += [glob[:, j:j + 1], patches[:, j], temp[:, j:j + 1]]
    rows.append(spat)
    want = np.concatenate(rows, axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_qformer_patch_projector_spec():
    """The patch projector accepts the full image-projector grammar
    (reference build_video_projector reuses it, builder.py:69-90)."""
    cfg = _cfg(video_projector_type="mlp2x_gelu")
    params = init(cfg, jax.random.PRNGKey(3))
    feats = jnp.zeros((1, 2, 5, 16))
    out = forward_video(params, cfg, feats)
    assert out.shape == (1, 8, 24)
