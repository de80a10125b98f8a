"""Interop smoke against the ACTUAL reference code on disk.

Round-2 review: every parity test used synthetic-weight HF state dicts or
independent torch oracles — fine, but it left "would a real reference
checkpoint load?" unproven (zero-egress env, no released weights).  The
PyTorch reference IS on disk, so: instantiate a tiny reference model from
/root/reference/llavamod on CPU, run it as the oracle, save its checkpoint
with save_pretrained, load that through models/builder.import_hf_llava,
and assert logit parity.

The reference's import graph needs three packages this image lacks — timm
(projector blocks we don't exercise), deepspeed (MoE layer), and
sentencepiece (gemma2 tokenizer) — which are stubbed at module level with
just enough surface for the imports; the Qwen1.5 modeling, config, and
weights exercised here are the reference's own vendored code
(llavamod/model/language_model/qwen1_5/modeling_qwen2.py).
"""

import sys
import types
import importlib.machinery

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def reference_models():
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
    stub("sentencepiece", SentencePieceProcessor=SPP)

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from llavamod.model.language_model.llava_llama import (  # noqa: F401
        LlavaLlamaConfig,
        LlavaLlamaForCausalLM,
    )
    from llavamod.model.language_model.llava_qwen1_5 import (
        LlavaQwen1_5Config,
        LlavaQwen1_5ForCausalLM,
    )

    return {
        "qwen1_5": (LlavaQwen1_5ForCausalLM, LlavaQwen1_5Config),
        "llama": (LlavaLlamaForCausalLM, LlavaLlamaConfig),
    }


def _tiny_ref(reference_models, family):
    cls, cfg_cls = reference_models[family]
    cfg = cfg_cls(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False)
    torch.manual_seed(0)
    model = cls(cfg)
    model.eval()
    return model, cfg


def _ref_logits(model, ids):
    with torch.no_grad():
        return model(input_ids=torch.tensor(ids),
                     use_cache=False).logits.float().numpy()


@pytest.mark.parametrize("family", ["qwen1_5", "llama"])
def test_reference_module_logit_parity(reference_models, family):
    """The live reference module (vendored modeling) as the oracle."""
    from llavamod_tpu.interop.hf import (
        decoder_config_from_hf,
        decoder_params_from_hf,
    )
    from llavamod_tpu.models.llm import decoder

    model, hf_cfg = _tiny_ref(reference_models, family)
    cfg = decoder_config_from_hf(hf_cfg)
    assert cfg.vocab_size == 512 and cfg.num_layers == 2
    params = decoder_params_from_hf(dict(model.state_dict()), cfg)

    ids = np.random.RandomState(0).randint(5, 500, (2, 16))
    want = _ref_logits(model, ids)
    out = decoder.forward(params, cfg, input_ids=jnp.asarray(ids),
                          attn_impl="xla")
    got = np.asarray(decoder.logits_from_hidden(params, cfg, out.hidden))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_reference_checkpoint_through_builder(reference_models, tmp_path):
    """save_pretrained -> models/builder.import_hf_llava -> logit parity
    (the reference's llava_qwen1_5 model_type resolves to the qwen2
    layout, interop/hf.py)."""
    from llavamod_tpu.models import builder
    from llavamod_tpu.models.llm import decoder

    model, _ = _tiny_ref(reference_models, "qwen1_5")
    ckpt = str(tmp_path / "ref_ckpt")
    model.save_pretrained(ckpt, safe_serialization=False)

    cfg, params = builder.import_hf_llava(ckpt)
    assert cfg.llm.vocab_size == 512
    ids = np.random.RandomState(1).randint(5, 500, (2, 12))
    want = _ref_logits(model, ids)
    out = decoder.forward(params["llm"], cfg.llm, input_ids=jnp.asarray(ids),
                          attn_impl="xla")
    got = np.asarray(decoder.logits_from_hidden(params["llm"], cfg.llm,
                                                out.hidden))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_reference_conversation_templates_match(reference_models):
    """Byte parity of rendered prompts against the reference's live
    conversation registry (not our frozen copies of the strings)."""
    import llavamod.conversation as ref_conv

    from llavamod_tpu import conversation as our_conv

    for name in ("qwen", "plain", "v1", "llava_llama_2", "gemma2"):
        if name not in ref_conv.conv_templates:
            continue
        if name == "plain":
            # one message only: the reference's PLAIN renderer crashes on a
            # second message (sep2=None, conversation.py:110-117) — stage-1
            # bypasses get_prompt entirely (data_utils.py:627-650)
            msgs = [("<image>a photo of a cat", None)]
        else:
            msgs = [("<image>\nWhat is this?", None), ("A cat.", None)]
        ref = ref_conv.conv_templates[name].copy()
        ours = our_conv.get_template(name).copy()
        for i, (text, _) in enumerate(msgs):
            ref.append_message(ref.roles[i % 2], text)
            ours.append_message(ours.roles[i % 2], text)
        assert ours.get_prompt() == ref.get_prompt(), name
