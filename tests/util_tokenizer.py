"""Tiny char-level HF tokenizer for CLI-level tests (AutoTokenizer-loadable)."""

import json
import os


def make_tiny_tokenizer(out_dir: str) -> str:
    """Write tokenizer.json + tokenizer_config.json readable by
    transformers.AutoTokenizer: char-level WordLevel over printable ASCII
    with <pad>/<unk>/<|endoftext|> specials (ids < 512 fit tiny_config)."""
    from tokenizers import Regex, Tokenizer, decoders, models, pre_tokenizers

    vocab = {"<pad>": 0, "<unk>": 1, "<|endoftext|>": 2}
    for i in range(32, 127):
        vocab[chr(i)] = len(vocab)
    vocab["\n"] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split(Regex("[\\s\\S]"),
                                             behavior="isolated")
    try:
        tok.decoder = decoders.Fuse()
    except AttributeError:
        pass
    os.makedirs(out_dir, exist_ok=True)
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as fh:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "pad_token": "<pad>", "unk_token": "<unk>",
                   "eos_token": "<|endoftext|>",
                   "model_max_length": 2048}, fh)
    return out_dir
