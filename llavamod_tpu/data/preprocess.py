"""Conversation JSON -> (input_ids, labels) preprocessing.

Host-side, torch-free re-implementation of the reference's `preprocess*`
family (data/data_utils.py:102-711).  Behavior parity:

  * preprocess_multimodal_text — clamp '<image>' count to MAX_IMAGE_LENGTH,
    expand '<video>' to num_frames x '<image>', optional <im_start>/<im_end>
    wrapping (data_utils.py:102-151).
  * preprocess_plain — stage-1 captions: prompt is exactly '<image>' +
    caption + sep, with the image span label-masked (data_utils.py:627-650).
  * preprocess_two_style — the SeparatorStyle.TWO family (phi/qwen of
    record, also v1/mistral/minicpm/stablelm/openchat): renders the
    conversation, tokenizes with image splice markers, masks every
    instruction span 'SYSTEM USER: ... ASSISTANT: ' per round, keeping only
    assistant responses (+separator) as labels (data_utils.py:318-394).
    On tokenization-length mismatch the whole sample is masked with a
    warning, exactly like the reference (data_utils.py:383-390).

All functions return python int lists; the static splice/pad happens later
(data/splice.py, data/collator.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

from llavamod_tpu import conversation as conv_lib
from llavamod_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    DEFAULT_VIDEO_TOKEN,
    IGNORE_INDEX,
    MAX_IMAGE_LENGTH,
    MAX_VIDEO_LENGTH,
)
from llavamod_tpu.mm_utils import tokenize_with_images
from llavamod_tpu.utils.logging import rank0_print


@dataclasses.dataclass
class TokenizedSample:
    input_ids: List[int]
    labels: List[int]


def preprocess_multimodal_text(sources, *, num_frames: int = 8,
                               use_im_start_end: bool = False):
    """Normalize image/video placeholders in conversation text (in place on a
    copied structure).  sources: list of conversations, each a list of
    {'from': 'human'|'gpt', 'value': str}."""
    out = [[dict(turn) for turn in src] for src in sources]
    for src in out:
        for turn in src:
            text = turn["value"]
            if text.startswith(DEFAULT_IMAGE_TOKEN) or text.startswith(DEFAULT_VIDEO_TOKEN):
                n_img = text.count(DEFAULT_IMAGE_TOKEN)
                if n_img > MAX_IMAGE_LENGTH:
                    text = text.replace(DEFAULT_IMAGE_TOKEN * n_img,
                                        DEFAULT_IMAGE_TOKEN * MAX_IMAGE_LENGTH).strip()
                n_vid = text.count(DEFAULT_VIDEO_TOKEN)
                if n_vid > MAX_VIDEO_LENGTH:
                    raise ValueError(f"too many videos in: {text!r}")
            img_rep = DEFAULT_IMAGE_TOKEN
            vid_rep = DEFAULT_IMAGE_TOKEN * num_frames
            if use_im_start_end:
                img_rep = DEFAULT_IM_START_TOKEN + img_rep + DEFAULT_IM_END_TOKEN
                vid_rep = DEFAULT_IM_START_TOKEN + vid_rep + DEFAULT_IM_END_TOKEN
            text = text.replace(DEFAULT_IMAGE_TOKEN, img_rep)
            text = text.replace(DEFAULT_VIDEO_TOKEN, vid_rep)
            turn["value"] = text
    return out


def preprocess_plain(sources, tokenizer,
                     template: Optional[conv_lib.Conversation] = None) -> TokenizedSample:
    """Stage-1 adaptor pretraining: one (image, caption) pair per sample."""
    template = template or conv_lib.get_template("plain")
    src = sources[0] if isinstance(sources[0], list) else sources
    assert len(src) == 2, "plain preprocessing expects exactly 2 turns"
    assert DEFAULT_IMAGE_TOKEN in src[0]["value"]
    prompt_part = DEFAULT_IMAGE_TOKEN
    text = prompt_part + src[1]["value"] + template.sep
    ids = tokenize_with_images(text, tokenizer)
    labels = list(ids)
    masked = len(tokenize_with_images(prompt_part, tokenizer))
    labels[:masked] = [IGNORE_INDEX] * masked
    return TokenizedSample(ids, labels)


def preprocess_two_style(sources, tokenizer,
                         template: conv_lib.Conversation,
                         *, extra_round_tokens: Optional[int] = None,
                         model_max_length: int = 1 << 30) -> TokenizedSample:
    """SeparatorStyle.TWO masking (phi/qwen of record; also v1 etc.).

    extra_round_tokens: how many tokens the sep2 separator contributes that
    splitting removes.  The reference hardcodes +1 ("for eos_token",
    data_utils.py:371) because Qwen's <|endoftext|> is one token; we derive
    it from the tokenizer so non-single-token separators mask correctly.
    """
    if extra_round_tokens is None:
        sep2_ids = tokenizer(template.sep2).input_ids
        bos = getattr(tokenizer, "bos_token_id", None)
        if sep2_ids and bos is not None and sep2_ids[0] == bos:
            sep2_ids = sep2_ids[1:]
        extra_round_tokens = len(sep2_ids)
    conv = template.copy()
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    src = sources[0] if (sources and isinstance(sources[0], list)) else sources
    if roles.get(src[0]["from"]) != conv.roles[0]:
        src = src[1:]
    conv.messages = []
    for j, turn in enumerate(src):
        role = roles[turn["from"]]
        assert role == conv.roles[j % 2], "conversation roles must alternate"
        conv.append(role, turn["value"])
    prompt = conv.render()

    ids = tokenize_with_images(prompt, tokenizer)
    labels = list(ids)

    sep = conv.sep + conv.roles[1] + ": "
    rounds = prompt.split(conv.sep2)
    cur = 0
    total = len(ids)
    ok = True
    for rou in rounds:
        if rou == "":
            break
        parts = rou.split(sep)
        if len(parts) != 2:
            break
        instruction = parts[0] + sep
        round_len = len(tokenize_with_images(rou, tokenizer)) + extra_round_tokens
        instruction_len = len(tokenize_with_images(instruction, tokenizer)) - 1
        labels[cur:cur + instruction_len] = [IGNORE_INDEX] * min(
            instruction_len, max(0, len(labels) - cur))
        cur += round_len
    labels[cur:] = [IGNORE_INDEX] * max(0, len(labels) - cur)

    if cur < model_max_length and cur != total:
        labels = [IGNORE_INDEX] * len(labels)
        rank0_print(f"WARNING: tokenization mismatch: {cur} vs. {total}. (ignored)")
    return TokenizedSample(ids, labels)


def preprocess_conversations(sources, tokenizer,
                             template_name: str = "qwen",
                             model_max_length: int = 1 << 30) -> TokenizedSample:
    """Dispatch on the conversation template (reference preprocess,
    data_utils.py:653-711)."""
    template = conv_lib.get_template(template_name)
    if template.style is conv_lib.SeparatorStyle.PLAIN:
        return preprocess_plain(sources, tokenizer, template)
    if template.style is conv_lib.SeparatorStyle.TWO:
        return preprocess_two_style(sources, tokenizer, template,
                                    model_max_length=model_max_length)
    raise NotImplementedError(
        f"preprocessing for style {template.style} not implemented yet")
