"""tools/import_hf: HF checkpoint dir -> native format, any family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llavamod_tpu.models.builder import load_model
from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.vision.vit import tiny_vision_config, vision_configs
from llavamod_tpu.tools import import_hf

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file


@pytest.fixture(scope="module", autouse=True)
def _tiny_tower():
    if "tiny-vit-x" not in vision_configs:
        vision_configs.register(
            "tiny-vit-x", tiny_vision_config(name="tiny-vit-x"))


def test_import_qwen2_dir_roundtrips_logits(tmp_path):
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf_model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    src = str(tmp_path / "hf")
    hf_model.save_pretrained(src)

    out = str(tmp_path / "native")
    import_hf.main(["--hf-path", src, "--output", out,
                    "--vision-tower", "tiny-vit-x",
                    "--projector", "mlp2x_gelu"])

    cfg, params = load_model(out)
    assert cfg.llm.name == "hf-qwen2"
    ids = np.random.RandomState(0).randint(0, 128, size=(1, 9))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.float().numpy()
    dout = decoder.forward(params["llm"], cfg.llm,
                           input_ids=jnp.asarray(ids), attn_impl="xla")
    got = np.asarray(decoder.logits_from_hidden(params["llm"], cfg.llm,
                                                dout.hidden))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_import_mpt_dir(tmp_path):
    """Fused-Wqkv layout auto-detected through the tool path."""
    hf_cfg = transformers.MptConfig(
        d_model=32, n_heads=4, n_layers=2, expansion_ratio=2,
        max_seq_len=64, vocab_size=96)
    torch.manual_seed(1)
    hf_model = transformers.MptForCausalLM(hf_cfg).eval()
    src = str(tmp_path / "hf")
    hf_model.save_pretrained(src)

    out = str(tmp_path / "native")
    import_hf.main(["--hf-path", src, "--output", out,
                    "--vision-tower", "tiny-vit-x"])
    cfg, params = load_model(out)
    assert cfg.llm.alibi and cfg.llm.tie_word_embeddings
    ids = np.random.RandomState(1).randint(0, 96, size=(1, 8))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.float().numpy()
    dout = decoder.forward(params["llm"], cfg.llm,
                           input_ids=jnp.asarray(ids), attn_impl="xla")
    got = np.asarray(decoder.logits_from_hidden(params["llm"], cfg.llm,
                                                dout.hidden))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
