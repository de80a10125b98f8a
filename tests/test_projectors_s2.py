"""Tests for S2 multi-scale features, QFormer/simple/pool projectors, and
the PEFT LoRA adapter round-trip (VERDICT round-1 coverage rows 8/12/13/19)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llavamod_tpu.models.projector import build_projector
from llavamod_tpu.models.vision import vit
from llavamod_tpu.models.vision.s2 import multiscale_forward
from llavamod_tpu.models.vision.vit import tiny_vision_config

pytestmark = pytest.mark.slow  # compile-heavy numerics; -m "not slow" skips


# ---------------------------------------------------------------------------
# S2
# ---------------------------------------------------------------------------

def test_s2_multiscale_shapes_and_base_scale_parity():
    cfg = tiny_vision_config(image_size=28, patch_size=14)  # grid 2x2
    params = vit.init(cfg, jax.random.PRNGKey(0))
    pixels = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28))

    feats = multiscale_forward(params, cfg, pixels, scales=(28, 56))
    assert feats.shape == (2, cfg.num_patches, cfg.hidden_size * 2)

    # channel block 0 must equal the plain single-scale features
    hidden = vit.forward(params, cfg, pixels, -2)
    base = vit.select_features(cfg, hidden, "patch")
    np.testing.assert_allclose(np.asarray(feats[..., :cfg.hidden_size]),
                               np.asarray(base), rtol=1e-5, atol=1e-5)


def test_s2_three_scales_and_determinism():
    cfg = tiny_vision_config(image_size=28, patch_size=14)
    params = vit.init(cfg, jax.random.PRNGKey(0))
    pixels = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    f1 = multiscale_forward(params, cfg, pixels, scales=(28, 56, 84))
    f2 = multiscale_forward(params, cfg, pixels, scales=(28, 56, 84))
    assert f1.shape == (1, cfg.num_patches, cfg.hidden_size * 3)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert np.isfinite(np.asarray(f1)).all()


def test_llava_config_s2_feature_dim():
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import tiny_config

    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu", s2_scales=(28, 56))
    assert cfg.vision_feature_dim == tiny_vision_config().hidden_size * 2


# ---------------------------------------------------------------------------
# projector zoo
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("spec,expected_tokens,n_tokens", [
    ("linear", 16, 16),
    ("mlp2x_gelu", 16, 16),
    ("pool_mlp2x_gelu", 4, 16),    # 2x2 avg pool: 16 -> 4
    ("identity", 16, 16),
    ("qformer2_8", 8, 16),         # 8 learnable queries
    ("cheap_qformer1_4", 4, 16),
    # in/out are BLOCK depths; tokens: 64 -> pool 16 -> 3x3 valid conv -> 4
    ("simple_in1_out1", 4, 64),
    ("cheap_simple_in1_out1", 4, 64),
])
def test_projector_shapes(spec, expected_tokens, n_tokens):
    vision_dim, llm_dim = 32, 64
    proj = build_projector(spec, vision_dim, llm_dim)
    params = proj.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, n_tokens, vision_dim))
    y = proj.apply(params, x)
    assert y.shape[0] == 3
    assert y.shape[1] == proj.num_output_tokens(n_tokens) == expected_tokens
    out_dim = vision_dim if spec == "identity" else llm_dim
    assert y.shape[2] == out_dim
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_projector_grads_flow():
    proj = build_projector("qformer2_8", 32, 48)
    params = proj.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))

    def loss(p):
        return jnp.sum(proj.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


# ---------------------------------------------------------------------------
# LoRA PEFT round-trip
# ---------------------------------------------------------------------------

def test_lora_peft_adapter_roundtrip(tmp_path):
    from llavamod_tpu.models import llava as llava_mod
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import tiny_config
    from llavamod_tpu.models.llm.upcycle import upcycle
    from llavamod_tpu.models.lora import (
        LoraConfig,
        init_lora,
        load_lora_adapter,
        merge_lora,
        save_lora_adapter,
    )

    cfg = LlavaConfig(llm=tiny_config(), vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu")
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    mcfg, mparams = upcycle(cfg.llm, params["llm"], moe_mode="sparse",
                            num_experts=2, top_k=2)
    params["llm"] = mparams

    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(params, lcfg, jax.random.PRNGKey(1))
    # make b nonzero so the round-trip is non-trivial (None = no adapter)
    lora = jax.tree_util.tree_map(lambda x: x + 0.1, lora)

    out = str(tmp_path / "adapter")
    save_lora_adapter(out, lora, lcfg)
    lora2, lcfg2 = load_lora_adapter(out, params)
    assert lcfg2.r == 4 and lcfg2.alpha == 8

    m1 = merge_lora(params, lora, lcfg)
    m2 = merge_lora(params, lora2, lcfg2)
    for a, b in zip(jax.tree_util.tree_leaves(m1),
                    jax.tree_util.tree_leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # and the merge actually changed the targeted weights
    before = params["llm"]["layers"][0]["mlp"]["experts"]["up"]
    after = m1["llm"]["layers"][0]["mlp"]["experts"]["up"]
    assert float(jnp.abs(after - before).max()) > 0


@pytest.mark.parametrize("ptype", ["qformer2_8", "cheap_qformer1_4",
                                   "pool_mlp2x_gelu", "simple_in1_out1"])
def test_mm_projector_bin_roundtrip_exotic_types(ptype, tmp_path):
    """qformer/pool/simple projectors checkpoint through mm_projector.bin
    (tree layout) and restore bit-exact given a template."""
    from llavamod_tpu.train.checkpoint import load_mm_projector, save_mm_projector

    proj = build_projector(ptype, 32, 48)
    params = proj.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "mm_projector.bin")
    save_mm_projector(path, params, ptype)
    template = proj.init(jax.random.PRNGKey(7))  # different values, same tree
    restored = load_mm_projector(path, ptype, template=template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored)
    # restored tree drives the projector identically
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 144, 32))
    np.testing.assert_array_equal(np.asarray(proj.apply(params, x)),
                                  np.asarray(proj.apply(restored, x)))


def test_mm_projector_bin_tree_layout_requires_template(tmp_path):
    from llavamod_tpu.train.checkpoint import load_mm_projector, save_mm_projector

    proj = build_projector("pool_mlp2x_gelu", 16, 24)
    params = proj.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "mm_projector.bin")
    save_mm_projector(path, params, "pool_mlp2x_gelu")
    with pytest.raises(ValueError, match="template"):
        load_mm_projector(path, "pool_mlp2x_gelu")


@pytest.mark.slow
def test_qformer_matches_transformers_blip2_oracle():
    """Our qformer projector == the reference's Blip2Model compute
    (multimodal_projector/qformer.py:9-60: proj_in -> Blip2QFormerModel
    [32 heads, cross-attn every layer, 2.6875x GELU MLP, post-LN, input
    layernorm] -> proj_out), weight-for-weight via the exported HF keys."""
    torch = pytest.importorskip("torch")
    from transformers.models.blip_2.configuration_blip_2 import Blip2QFormerConfig
    from transformers.models.blip_2.modeling_blip_2 import Blip2QFormerModel

    from llavamod_tpu.interop.hf import projector_params_to_hf

    vision_dim, llm_dim, n_layers, n_queries = 80, 64, 2, 8
    spec = f"qformer{n_layers}_{n_queries}"
    proj = build_projector(spec, vision_dim, llm_dim)
    params = proj.init(jax.random.PRNGKey(3))
    # non-trivial weights (init gives zero queries/biases)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(
            jax.random.PRNGKey(hash(str(x.shape)) % 2**31), x.shape), params)

    state = {k: torch.tensor(np.asarray(v).copy())
             for k, v in projector_params_to_hf(params, spec, prefix="").items()}
    strip = {k[len("image_spatial_proj."):]: v for k, v in state.items()}

    qcfg = Blip2QFormerConfig(
        hidden_size=llm_dim, num_hidden_layers=n_layers,
        num_attention_heads=32, intermediate_size=int(llm_dim * 2.6875),
        encoder_hidden_size=llm_dim, cross_attention_frequency=1,
        hidden_act="gelu", layer_norm_eps=1e-12,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    qf = Blip2QFormerModel(qcfg).eval()
    qf_state = {k[len("qformer."):]: v for k, v in strip.items()
                if k.startswith("qformer.")}
    missing, unexpected = qf.load_state_dict(qf_state, strict=False)
    # embeddings-only leftovers are fine; every attention/mlp/ln key must load
    assert not unexpected, unexpected
    assert all("embedding" in k or "position" in k for k in missing), missing

    def seq(prefix, din, dmid, dout):
        m = torch.nn.Sequential(torch.nn.Linear(din, dmid), torch.nn.GELU(),
                                torch.nn.Linear(dmid, dout))
        m[0].weight.data = strip[prefix + ".0.weight"]
        m[0].bias.data = strip[prefix + ".0.bias"]
        m[2].weight.data = strip[prefix + ".2.weight"]
        m[2].bias.data = strip[prefix + ".2.bias"]
        return m.eval()

    proj_in = seq("proj_in", vision_dim, llm_dim, llm_dim)
    proj_out = seq("proj_out", llm_dim, llm_dim, llm_dim)
    query_tokens = strip["query_tokens"]

    x = np.random.default_rng(0).normal(size=(2, 10, vision_dim)).astype(np.float32)
    with torch.no_grad():
        img = proj_in(torch.tensor(x))
        q = query_tokens.expand(2, -1, -1)
        hidden = qf(query_embeds=q, encoder_hidden_states=img,
                    return_dict=True).last_hidden_state
        expected = proj_out(hidden).numpy()

    got = np.asarray(proj.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)
