import numpy as np
import pytest
from PIL import Image

from llavamod_tpu.constants import IMAGE_TOKEN_INDEX
from llavamod_tpu.mm_utils import (
    ImagePreprocessor,
    StopOnKeywords,
    expand2square,
    get_model_name_from_path,
    tokenize_with_images,
)


class ToyTokenizer:
    """Char-level tokenizer with optional BOS, for splice-semantics tests."""

    def __init__(self, bos=None):
        self.bos_token_id = bos

    def __call__(self, text):
        ids = [ord(c) for c in text]
        if self.bos_token_id is not None:
            ids = [self.bos_token_id] + ids

        class R:
            pass

        r = R()
        r.input_ids = ids
        return r

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(i) for i in ids if 0 < i < 0x110000)


def test_tokenize_with_images_no_bos():
    tok = ToyTokenizer()
    ids = tokenize_with_images("ab<image>cd", tok)
    assert ids == [ord("a"), ord("b"), IMAGE_TOKEN_INDEX, ord("c"), ord("d")]


def test_tokenize_with_images_with_bos():
    tok = ToyTokenizer(bos=1)
    ids = tokenize_with_images("ab<image>cd", tok)
    # BOS kept once at front, stripped from the second chunk.
    assert ids == [1, ord("a"), ord("b"), IMAGE_TOKEN_INDEX, ord("c"), ord("d")]


def test_tokenize_multiple_images():
    tok = ToyTokenizer()
    ids = tokenize_with_images("<image>x<image>", tok)
    assert ids == [IMAGE_TOKEN_INDEX, ord("x"), IMAGE_TOKEN_INDEX]


def test_tokenize_leading_image():
    tok = ToyTokenizer()
    ids = tokenize_with_images("<image>\ncaption", tok)
    assert ids[0] == IMAGE_TOKEN_INDEX
    assert ids[1] == ord("\n")


def test_expand2square():
    img = Image.new("RGB", (100, 60), (10, 20, 30))
    sq = expand2square(img, (0, 0, 0))
    assert sq.size == (100, 100)
    # Content centered vertically.
    assert sq.getpixel((50, 50)) == (10, 20, 30)
    assert sq.getpixel((50, 5)) == (0, 0, 0)
    # Square image returned as-is.
    assert expand2square(sq, (0, 0, 0)) is sq


def test_image_preprocessor_shapes_and_norm():
    pp = ImagePreprocessor(size=336, image_aspect_ratio="pad")
    img = Image.new("RGB", (200, 100), tuple(int(m * 255) for m in pp.mean))
    out = pp(img)
    assert out.shape == (1, 3, 336, 336)
    # A mean-colored image normalizes to ~0 everywhere.
    assert np.abs(out).max() < 0.05


def test_image_preprocessor_no_pad_crops():
    pp = ImagePreprocessor(size=336)
    img = Image.new("RGB", (700, 350), (255, 255, 255))
    out = pp(img)
    assert out.shape == (1, 3, 336, 336)


def test_get_model_name_from_path():
    assert get_model_name_from_path("/a/b/llava-qwen-2b") == "llava-qwen-2b"
    assert get_model_name_from_path("/a/model/checkpoint-100/") == "model_checkpoint-100"


def test_stop_on_keywords():
    tok = ToyTokenizer()
    stop = StopOnKeywords(["###"], tok, prompt_len=3)
    seq = [ord(c) for c in "abcdef"]
    assert not stop(seq)
    seq_stop = [ord(c) for c in "abcde###"]
    assert stop(seq_stop)
