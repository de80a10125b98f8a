"""Self-contained tiktoken tokenizers (qwen-1.0, stablelm arcade100k) vs
the LIVE reference implementations as oracle.

The reference ships these as trust_remote_code artifacts
(tokenization_qwen.py, tokenization_arcade100k.py); our one engine
(interop/tiktoken_tokenizers.py) must produce identical ids, decodes, and
special-token handling from the same .tiktoken vocab file.  The vocab is
synthetic (single bytes + all 2-byte strings + 3-byte tail, a valid BPE
rank table of exactly the size each reference asserts)."""

import importlib.util
import itertools
import os

import pytest

pytest.importorskip("tiktoken")
transformers = pytest.importorskip("transformers")

from llavamod_tpu.interop.tiktoken_tokenizers import (  # noqa: E402
    Arcade100kTokenizer,
    QWenV1Tokenizer,
    load_tiktoken_tokenizer,
)

pytestmark = pytest.mark.slow  # big synthetic vocab tables

REFERENCE = "/root/reference"

TEXTS = [
    "hello world",
    "  leading spaces and\nnewlines\r\n\r\n",
    "mixed UNICODE: café 你好 Ümläut 123",
    "specials inline <|endoftext|> and <|im_start|>chat<|im_end|> tail",
    "NFC normalization: é vs é",  # composed after NFC
    "code: def f(x):\n    return x ** 2  # comment",
    "",
]


def _ref_module(fname):
    path = os.path.join(REFERENCE, "llavamod/model/language_model", fname)
    if not os.path.exists(path):
        pytest.skip("reference checkout not present")
    spec = importlib.util.spec_from_file_location(
        fname.replace("/", "_").replace(".py", ""), path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _synth_vocab(path, n_ranks):
    """Valid BPE rank table of exactly n_ranks entries: 256 single bytes,
    then every 2-byte string, then 3-byte strings (each splits into an
    existing 2-byte + 1-byte pair)."""
    import base64

    lines = []
    rank = 0
    for b in range(256):
        lines.append((bytes([b]), rank))
        rank += 1
    for pair in itertools.product(range(256), repeat=2):
        if rank >= n_ranks:
            break
        lines.append((bytes(pair), rank))
        rank += 1
    for tri in itertools.product(range(256), repeat=3):
        if rank >= n_ranks:
            break
        lines.append((bytes(tri), rank))
        rank += 1
    assert rank == n_ranks
    with open(path, "w") as fh:
        for tok, r in lines:
            fh.write(base64.b64encode(tok).decode() + f" {r}\n")
    return path


@pytest.fixture(scope="module")
def qwen_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("qwen_tok")
    # qwen asserts len(ranks) + len(specials) == n_vocab (contiguous):
    # specials sit at 151643..151850, so exactly 151643 ranks
    vf = _synth_vocab(str(d / "qwen.tiktoken"), 151643)
    ref = _ref_module("qwen/tokenization_qwen.py").QWenTokenizer(vf)
    ours = QWenV1Tokenizer(vf)
    return ref, ours


@pytest.fixture(scope="module")
def arcade_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("arcade_tok")
    # arcade asserts len(ranks) + len(specials) + 1 == n_vocab (one gap at
    # 100256): exactly 100256 ranks, specials from 100257
    vf = _synth_vocab(str(d / "arcade100k.tiktoken"), 100256)
    ref = _ref_module(
        "stablelm/tokenization_arcade100k.py").Arcade100kTokenizer(vf)
    ours = Arcade100kTokenizer(vf)
    return ref, ours


@pytest.mark.parametrize("text", TEXTS)
def test_qwen_encode_decode_parity(qwen_pair, text):
    ref, ours = qwen_pair
    ref_ids = ref.convert_tokens_to_ids(ref.tokenize(text))
    our_ids = ours.convert_tokens_to_ids(ours.tokenize(text))
    assert our_ids == ref_ids, text
    assert ours.decode(our_ids) == ref.decode(ref_ids)
    # skip_special_tokens drops everything at/above <|endoftext|>
    assert (ours.decode(our_ids, skip_special_tokens=True)
            == ref.decode(ref_ids, skip_special_tokens=True))


@pytest.mark.parametrize("text", TEXTS)
def test_arcade_encode_decode_parity(arcade_pair, text):
    ref, ours = arcade_pair
    ref_ids = ref.convert_tokens_to_ids(ref.tokenize(text))
    our_ids = ours.convert_tokens_to_ids(ours.tokenize(text))
    assert our_ids == ref_ids, text
    assert ours.decode(our_ids) == ref.decode(ref_ids)


def test_qwen_special_table_matches(qwen_pair):
    ref, ours = qwen_pair
    assert ours.special_tokens == ref.special_tokens
    assert len(ours) == len(ref) == 151851
    # the reference's unk/pad injection token (train.py:365-385)
    assert ours.convert_tokens_to_ids("<|extra_0|>") == 151646
    assert ours.eod_id == ref.eod_id == 151643
    assert ours.im_start_id == ref.im_start_id
    assert ours.im_end_id == ref.im_end_id


def test_arcade_special_table_matches(arcade_pair):
    ref, ours = arcade_pair
    assert ours.special_tokens == ref.special_tokens
    assert len(ours) == len(ref) == 100289  # 100256 ranks + 32 specials + gap
    assert ours.pad_token == ours.eos_token == "<|endoftext|>"
    assert ref.pad_token == ref.eos_token == "<|endoftext|>"


def test_vocab_roundtrip_and_loader_dispatch(qwen_pair, tmp_path):
    _, ours = qwen_pair
    out = tmp_path / "saved"
    out.mkdir()
    (path,) = ours.save_vocabulary(str(out))
    assert os.path.basename(path) == "qwen.tiktoken"
    # directory dispatch picks the right class; empty dir gives None
    loaded = load_tiktoken_tokenizer(str(out))
    assert isinstance(loaded, QWenV1Tokenizer)
    assert loaded.tokenize("hello") == ours.tokenize("hello")
    assert load_tiktoken_tokenizer(str(tmp_path)) is None


def test_tokenizer_image_token_integration(qwen_pair):
    """mm_utils.tokenizer_image_token splices IMAGE_TOKEN_INDEX through a
    tiktoken tokenizer (the stage-1 data path for a qwen-1.0 student)."""
    from llavamod_tpu.constants import IMAGE_TOKEN_INDEX
    from llavamod_tpu.mm_utils import tokenizer_image_token

    _, ours = qwen_pair
    ids = tokenizer_image_token("hi <image>\nthere", ours)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    left = ids[:ids.index(IMAGE_TOKEN_INDEX)]
    assert left == ours.convert_tokens_to_ids(ours.tokenize("hi "))
