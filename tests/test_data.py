"""Data pipeline tests: preprocessing masks, static splice, collators."""

import numpy as np

from llavamod_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from llavamod_tpu.data.collator import DPOCollator, SupervisedCollator
from llavamod_tpu.data.preprocess import (
    preprocess_conversations,
    preprocess_multimodal_text,
    preprocess_plain,
)
from llavamod_tpu.data.splice import expand_image_tokens


class CharTok:
    bos_token_id = None

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [ord(c) % 500 for c in text]
        return r


def test_preprocess_plain():
    src = [{"from": "human", "value": "<image>\nignored"},
           {"from": "gpt", "value": "a red bus"}]
    out = preprocess_plain([src], CharTok())
    # prompt is exactly <image> + caption + "\n"
    assert out.input_ids[0] == IMAGE_TOKEN_INDEX
    assert out.labels[0] == IGNORE_INDEX
    # caption tokens are supervised
    assert out.labels[1:] == out.input_ids[1:]
    assert len(out.input_ids) == 1 + len("a red bus\n")


def test_preprocess_qwen_masks_instructions():
    convs = [[{"from": "human", "value": "<image>\nWhat?"},
              {"from": "gpt", "value": "A cat."}]]
    out = preprocess_conversations(convs, CharTok(), "qwen")
    labels = np.array(out.labels)
    n_masked = int((labels == IGNORE_INDEX).sum())
    assert 0 < n_masked < len(labels)
    # the response span "A cat." must be supervised
    sup = [l for l in out.labels if l != IGNORE_INDEX]
    text = "".join(chr(t) for t in sup if t < 500)
    assert "A cat." in text


def test_preprocess_multiround_masking():
    convs = [[{"from": "human", "value": "q1"},
              {"from": "gpt", "value": "a1"},
              {"from": "human", "value": "q2"},
              {"from": "gpt", "value": "a2"}]]
    out = preprocess_conversations(convs, CharTok(), "qwen")
    sup = "".join(chr(t) for t in out.labels if t != IGNORE_INDEX and t < 500)
    assert "a1" in sup and "a2" in sup
    assert "q1" not in sup and "q2" not in sup


def test_preprocess_multimodal_text_clamps_images():
    src = [[{"from": "human", "value": "<image>" * 20 + "\nhello"}]]
    out = preprocess_multimodal_text(src)
    assert out[0][0]["value"].count("<image>") == 16  # MAX_IMAGE_LENGTH
    # original untouched
    assert src[0][0]["value"].count("<image>") == 20


def test_expand_image_tokens_right_pad():
    ids = [5, IMAGE_TOKEN_INDEX, 7, 8]
    labs = [IGNORE_INDEX, IGNORE_INDEX, 7, 8]
    out = expand_image_tokens(ids, labs, num_image_tokens=4, max_len=12,
                              max_images=1, pad_id=0)
    assert out.length == 3 + 4
    np.testing.assert_array_equal(out.input_ids[:7], [5, 0, 0, 0, 0, 7, 8])
    np.testing.assert_array_equal(out.image_mask[:7],
                                  [0, 1, 1, 1, 1, 0, 0])
    np.testing.assert_array_equal(out.image_slot[1:5], [0, 1, 2, 3])
    assert out.labels[5] == 7
    assert all(out.labels[i] == IGNORE_INDEX for i in range(1, 5))
    assert out.segment[:7].sum() == 7 and out.segment[7:].sum() == 0


def test_expand_image_tokens_left_pad():
    ids = [IMAGE_TOKEN_INDEX, 9]
    out = expand_image_tokens(ids, None, num_image_tokens=2, max_len=6,
                              max_images=1, pad_side="left")
    np.testing.assert_array_equal(out.segment, [0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(out.input_ids[3:], [0, 0, 9])
    np.testing.assert_array_equal(out.image_mask, [0, 0, 0, 1, 1, 0])


def test_expand_image_tokens_truncation():
    ids = [1, IMAGE_TOKEN_INDEX, 2, 3, 4]
    out = expand_image_tokens(ids, None, num_image_tokens=8, max_len=6,
                              max_images=1)
    assert out.length == 6
    assert out.input_ids.shape == (6,)
    # image slots run past max_len -> truncated after splice (reference
    # truncate-after-splice, llava_arch.py:279-283)
    assert out.image_mask[1:6].all()


def test_expand_image_tokens_over_budget_images_dropped():
    ids = [IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX, 5]
    out = expand_image_tokens(ids, None, num_image_tokens=2, max_len=8,
                              max_images=1)
    assert out.num_images == 1
    assert out.image_mask.sum() == 2


def test_supervised_collator_batch_offsets():
    coll = SupervisedCollator(max_len=10, num_image_tokens=2, image_size=14,
                              max_images=1)
    samples = [
        {"input_ids": [1, IMAGE_TOKEN_INDEX, 2], "labels": [1, -100, 2],
         "pixels": np.zeros((1, 3, 14, 14), np.float32)},
        {"input_ids": [IMAGE_TOKEN_INDEX, 3], "labels": [-100, 3],
         "pixels": np.zeros((1, 3, 14, 14), np.float32)},
    ]
    b = coll(samples)
    assert b["input_ids"].shape == (2, 10)
    assert b["pixels"].shape == (2, 1, 3, 14, 14)
    # sample 1's image rows live at global offset 2 (= 1 sample * 1 img * 2 tok)
    assert b["image_pos"][1][b["image_mask"][1]].tolist() == [2, 3]
    assert b["pixel_valid"].all()


def test_dpo_collator_shares_images():
    coll = DPOCollator(max_len=8, num_image_tokens=2, image_size=14)
    samples = [{
        "chosen_input_ids": [IMAGE_TOKEN_INDEX, 1],
        "chosen_labels": [-100, 1],
        "rejected_input_ids": [IMAGE_TOKEN_INDEX, 2, 3],
        "rejected_labels": [-100, 2, 3],
        "pixels": np.ones((1, 3, 14, 14), np.float32),
    }]
    b = coll(samples)
    assert b["chosen_input_ids"].shape == (1, 8)
    assert b["rejected_input_ids"].shape == (1, 8)
    assert b["pixels"].shape == (1, 1, 3, 14, 14)
    assert (b["chosen_image_mask"].sum() == 2
            and b["rejected_image_mask"].sum() == 2)
