"""Prompt-rendering parity tests: rendered strings must byte-match the
reference templates (llavamod/conversation.py) for the formats used by the
training recipe of record."""

from llavamod_tpu.conversation import (
    SeparatorStyle,
    conv_templates,
    get_template,
    infer_template_name,
)


def test_qwen_phi_template_render():
    conv = get_template("qwen")
    conv.append(conv.roles[0], "<image>\nWhat is in the picture?")
    conv.append(conv.roles[1], "A cat.")
    expected = (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions. "
        "USER: <image>\nWhat is in the picture? ASSISTANT: A cat.<|endoftext|>"
    )
    assert conv.render() == expected


def test_qwen_template_generation_prompt():
    conv = get_template("qwen")
    conv.append(conv.roles[0], "Hi")
    conv.append(conv.roles[1], None)  # unterminated assistant turn
    assert conv.render().endswith("USER: Hi ASSISTANT:")


def test_plain_template():
    conv = get_template("plain")
    conv.append("", "<image>")
    conv.append("", "a photo of a dog")
    assert conv.render() == "<image>\na photo of a dog"


def test_v1_template_uses_eos_sep2():
    conv = get_template("v1")
    conv.append(conv.roles[0], "q")
    conv.append(conv.roles[1], "a")
    assert conv.render().endswith("ASSISTANT: a</s>")


def test_llama2_template():
    conv = get_template("llama_2")
    conv.append(conv.roles[0], "hello")
    conv.append(conv.roles[1], "world")
    out = conv.render()
    assert out.startswith("[INST] <<SYS>>\n")
    assert out.endswith(" world </s>")


def test_mpt_template():
    conv = get_template("mpt")
    conv.append(conv.roles[0], "hi")
    conv.append(conv.roles[1], None)
    out = conv.render()
    assert "<|im_start|>user\nhi<|im_end|>" in out
    assert out.endswith("<|im_start|>assistant\n")


def test_gemma2_template():
    conv = get_template("gemma_2")
    conv.append(conv.roles[0], "hi")
    conv.append(conv.roles[1], "yo")
    out = conv.render()
    assert "<start_of_turn>user\nhi<end_of_turn>\n" in out
    assert "<start_of_turn>model\nyo<end_of_turn>\n<eos>" in out


def test_mmtag_front_image_rewrite():
    conv = get_template("v1_mmtag")
    conv.append(conv.roles[0], ("<image>\nWhat?", None, None))
    conv.append(conv.roles[1], None)
    out = conv.render()
    assert "<Image><image></Image>" in out
    assert "Received." in out


def test_registry_complete():
    for name in ["default", "v0", "v1", "openchat", "mistral", "minicpm", "phi",
                 "qwen", "stablelm", "vicuna_v1", "llama_2", "gemma_2", "plain",
                 "v0_plain", "llava_v0", "v0_mmtag", "llava_v1", "v1_mmtag",
                 "llava_llama_2", "mpt"]:
        assert name in conv_templates, name


def test_copy_is_independent():
    a = get_template("qwen")
    a.append("USER", "x")
    b = get_template("qwen")
    assert b.messages == []
    assert a.style is SeparatorStyle.TWO


def test_infer_template_name():
    assert infer_template_name("llava-qwen1.5-1.8b") == "qwen"
    assert infer_template_name("llava-v1.5-7b") == "llava_v1"
    assert infer_template_name("some-gemma-model") == "gemma_2"
