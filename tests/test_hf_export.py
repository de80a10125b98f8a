"""HF checkpoint export round-trips (reference save flavor (c) parity):
native params -> pytorch_model.bin with DeepSpeed-MoE key naming ->
re-import -> identical logits."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llavamod_tpu.interop.hf import export_hf_llava
from llavamod_tpu.models import llava as llava_mod
from llavamod_tpu.models.builder import import_hf_llava
from llavamod_tpu.models.llava import LlavaConfig
from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.llm.config import tiny_config
from llavamod_tpu.models.llm.upcycle import upcycle
from llavamod_tpu.models.vision.vit import tiny_vision_config

pytestmark = pytest.mark.slow  # compile-heavy numerics; -m "not slow" skips


def _tiny(moe: bool):
    llm = tiny_config(num_heads=4, num_kv_heads=2, qkv_bias=True,
                      tie_word_embeddings=False)
    cfg = LlavaConfig(llm=llm, vision=tiny_vision_config(),
                      projector_type="mlp2x_gelu")
    params = llava_mod.init(cfg, jax.random.PRNGKey(0))
    if moe:
        mcfg, mparams = upcycle(cfg.llm, params["llm"], moe_mode="sparse",
                                num_experts=2, top_k=2)
        # de-degenerate the experts so the round-trip is non-trivial
        mparams["layers"][0]["mlp"]["experts"]["up"] = (
            mparams["layers"][0]["mlp"]["experts"]["up"]
            + 0.01 * jax.random.normal(
                jax.random.PRNGKey(9),
                mparams["layers"][0]["mlp"]["experts"]["up"].shape))
        mparams["layers"][0]["mlp"]["router"] = 0.1 * jax.random.normal(
            jax.random.PRNGKey(10),
            mparams["layers"][0]["mlp"]["router"].shape)
        cfg = cfg.replace(llm=mcfg)
        params["llm"] = mparams
    return cfg, params


@pytest.mark.parametrize("moe", [False, True])
def test_export_import_logit_parity(tmp_path, moe):
    cfg, params = _tiny(moe)
    out = str(tmp_path / ("hf_moe" if moe else "hf_dense"))
    export_hf_llava(out, cfg, params)
    assert os.path.exists(os.path.join(out, "pytorch_model.bin"))
    hf_cfg = json.load(open(os.path.join(out, "config.json")))
    if moe:
        assert hf_cfg["moe"]["moe_enable"]
        assert hf_cfg["moe"]["moe_layers_idx"] == [0]

    cfg2, params2 = import_hf_llava(out)
    assert cfg2.llm.is_moe == moe
    if moe:
        assert cfg2.llm.moe_layers == cfg.llm.moe_layers
        assert cfg2.llm.moe_num_experts == cfg.llm.moe_num_experts

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                             cfg.llm.vocab_size)
    o1 = decoder.forward(params["llm"], cfg.llm, input_ids=ids, train=False)
    o2 = decoder.forward(params2["llm"], cfg2.llm, input_ids=ids, train=False)
    l1 = decoder.logits_from_hidden(params["llm"], cfg.llm, o1.hidden)
    l2 = decoder.logits_from_hidden(params2["llm"], cfg2.llm, o2.hidden)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)


def test_exported_moe_keys_use_deepspeed_naming(tmp_path):
    cfg, params = _tiny(moe=True)
    out = str(tmp_path / "hf")
    export_hf_llava(out, cfg, params)
    import torch

    state = torch.load(os.path.join(out, "pytorch_model.bin"),
                       map_location="cpu", weights_only=True)
    assert "model.layers.0.mlp.deepspeed_moe.gate.wg.weight" in state
    assert ("model.layers.0.mlp.deepspeed_moe.experts.deepspeed_experts"
            ".1.up_proj.weight") in state
    # non-moe layer keeps the dense naming
    assert "model.layers.1.mlp.up_proj.weight" in state
    # projector exported under the reference's key layout
    assert "model.mm_projector.image_spatial_proj.0.weight" in state


def test_pool_projector_roundtrip():
    """pool_mlp2x_gelu export uses the Pool_Block 'block.' Sequential keys
    (reference pool_block.py:18) and round-trips."""
    import jax

    from llavamod_tpu.interop.hf import (projector_params_from_hf,
                                         projector_params_to_hf)
    from llavamod_tpu.models.projector import build_projector

    proj = build_projector("pool_mlp2x_gelu", 16, 24)
    params = proj.init(jax.random.PRNGKey(0))
    state = projector_params_to_hf(params, "pool_mlp2x_gelu")
    assert "model.mm_projector.image_spatial_proj.block.0.weight" in state
    assert "model.mm_projector.image_spatial_proj.block.2.bias" in state
    back = projector_params_from_hf(state, "pool_mlp2x_gelu")
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
