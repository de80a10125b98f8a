"""Batched autoregressive generation with a static KV cache.

Replaces the reference's HF `model.generate` path — which runs batch-size 1
and even disables the KV cache in batched eval (model_vqa_loader.py:128,
`use_cache=False`: a full re-forward per token, flagged in SURVEY.md §3.4 as
a perf bug).  Here: one jitted prefill (multimodal splice included) + one
jitted `lax.scan` decode loop over a preallocated cache, any batch size,
greedy or temperature/top-k/top-p sampling, early-stop via a done mask.

Prompts must be LEFT-padded (segment 0 on the left) so every sequence's
next-token slot is the last position; positions are segment-aware so RoPE
sees 0 at each sequence's first real token.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llavamod_tpu.models import llava
from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.llava import LlavaConfig, MultimodalBatch


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 128
    temperature: float = 0.0          # 0 => greedy
    top_k: int = 0                    # 0 => disabled
    top_p: float = 1.0
    eos_token_ids: Tuple[int, ...] = ()
    # multi-token stop strings as token-id sequences (KeywordsStoppingCriteria
    # parity, reference mm_utils.py:74-105): a sequence whose sep2 tokenizes
    # to >1 token (e.g. '</s>' under BPE) still stops early on device.
    stop_sequences: Tuple[Tuple[int, ...], ...] = ()
    pad_token_id: int = 0
    cache_dtype: str = "bfloat16"


def _sample(logits: jnp.ndarray, gcfg: GenerationConfig, key) -> jnp.ndarray:
    """logits [B, V] -> next ids [B]."""
    if gcfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / gcfg.temperature
    if gcfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -gcfg.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gcfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < gcfg.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _stop_machinery(gcfg: GenerationConfig, b: int):
    """(is_eos, push_window, window_stopped, win) closures for EOS ids and
    multi-token stop sequences (KeywordsStoppingCriteria parity)."""
    eos = jnp.asarray(gcfg.eos_token_ids, jnp.int32) if gcfg.eos_token_ids \
        else jnp.zeros((0,), jnp.int32)
    win = max([len(s) for s in gcfg.stop_sequences], default=0)
    stops = [jnp.asarray(s, jnp.int32) for s in gcfg.stop_sequences]

    def is_eos(tok):
        if eos.shape[0] == 0:
            return jnp.zeros_like(tok, dtype=bool)
        return jnp.any(tok[:, None] == eos[None, :], axis=-1)

    def push_window(window, tok):
        if win == 0:
            return window
        return jnp.concatenate([window[:, 1:], tok[:, None]], axis=1)

    def window_stopped(window):
        if win == 0:
            return jnp.zeros((b,), bool)
        hit = jnp.zeros((b,), bool)
        for s in stops:
            tail = window[:, win - s.shape[0]:]
            hit = hit | jnp.all(tail == s[None, :], axis=1)
        return hit

    return is_eos, push_window, window_stopped, win


@functools.partial(jax.jit, static_argnums=(1, 3))
def _prefill_jit(params, cfg: LlavaConfig, batch: MultimodalBatch,
                 gcfg: GenerationConfig, rng):
    """Jitted prefill: encode the multimodal prompt into a fresh cache and
    sample the first token.  Returns (decode carry, prompt_len [B])."""
    b, t = batch.input_ids.shape
    total = t + gcfg.max_new_tokens
    cache_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                   "int8": "int8"}[gcfg.cache_dtype]

    # segment-aware positions: 0 at each sequence's first real token
    seg = batch.segment_ids
    positions = jnp.maximum(jnp.cumsum(seg, axis=1) - 1, 0)
    prompt_len = jnp.sum(seg, axis=1)  # [B] real lengths

    cache = decoder.constrain_cache(
        decoder.init_cache(cfg.llm, b, total, dtype=cache_dtype))
    # attn_impl="fresh": the cache is empty, so prefill attention runs on the
    # chunk's own K/V through the flash kernel (decoder.attention_forward)
    out = llava.forward(params, cfg, batch._replace(positions=positions),
                        cache=cache, train=False, attn_impl="fresh")
    out = out._replace(cache=decoder.constrain_cache(out.cache))
    last_logits = llava.logits(params, cfg, out.hidden[:, -1:])[:, 0]

    is_eos, push_window, window_stopped, win = _stop_machinery(gcfg, b)
    rng0, rng_loop = jax.random.split(rng)
    first_tok = _sample(last_logits, gcfg, rng0)
    window0 = push_window(jnp.full((b, win), -1, jnp.int32), first_tok)
    done0 = is_eos(first_tok) | window_stopped(window0)
    return (out.cache, first_tok, done0, window0, rng_loop), prompt_len


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _decode_chunk_jit(params, cfg: LlavaConfig, gcfg: GenerationConfig,
                      chunk: int, carry, prompt_len, start):
    """Jitted decode of `chunk` tokens from a carry.

    `start` is a DEVICE scalar (the global decode-step offset) so successive
    chunks reuse one compilation.  Returns (new carry, toks [B, chunk]) where
    toks are the newly sampled tokens of this chunk.
    """
    b = prompt_len.shape[0]
    is_eos, push_window, window_stopped, _ = _stop_machinery(gcfg, b)

    def body(carry, i):
        cache, tok, done, window, key = carry
        key, sub = jax.random.split(key)
        emb = decoder.embed(params["llm"], cfg.llm, tok[:, None])
        dout = decoder.forward(params["llm"], cfg.llm, inputs_embeds=emb,
                               positions=(prompt_len + i)[:, None],
                               segment_ids=jnp.ones((b, 1), jnp.int32),
                               cache=cache, train=False)
        logits = llava.logits(params, cfg, dout.hidden[:, -1:])[:, 0]
        nxt = _sample(logits, gcfg, sub)
        nxt = jnp.where(done, gcfg.pad_token_id, nxt)
        new_window = push_window(window, nxt)
        new_done = done | is_eos(nxt) | window_stopped(new_window)
        return (decoder.constrain_cache(dout.cache), nxt, new_done,
                new_window, key), nxt

    carry, toks = jax.lax.scan(body, carry, start + jnp.arange(chunk))
    return carry, jnp.swapaxes(toks, 0, 1)


def generate(params, cfg: LlavaConfig, batch: MultimodalBatch,
             gcfg: GenerationConfig, rng=None) -> np.ndarray:
    """Returns generated ids [B, max_new_tokens] (pad after EOS)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    carry, prompt_len = _prefill_jit(params, cfg, batch, gcfg, rng)
    first_tok = carry[1]
    parts = [first_tok[:, None]]
    if gcfg.max_new_tokens > 1:
        _, toks = _decode_chunk_jit(params, cfg, gcfg,
                                    gcfg.max_new_tokens - 1, carry,
                                    prompt_len, jnp.zeros((), jnp.int32))
        parts.append(toks)
    gen = jnp.concatenate(parts, axis=1)
    return truncate_at_stops(np.asarray(gen), gcfg)


def generate_stream(params, cfg: LlavaConfig, batch: MultimodalBatch,
                    gcfg: GenerationConfig, rng=None, chunk: int = 8):
    """Incremental generation: yields np arrays [B, <=chunk] of newly decoded
    ids as they are produced (TextStreamer parity with the reference
    serve/cli.py:99-108), decoding in jitted chunks so the loop stays
    compiled.  Stops early once every sequence hit EOS/a stop string.
    The concatenation of all yields == generate(...) before stop-truncation
    (identical RNG split order), so callers apply truncate_at_stops to the
    accumulated ids for final text.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    carry, prompt_len = _prefill_jit(params, cfg, batch, gcfg, rng)
    yield np.asarray(carry[1])[:, None]
    produced = 1
    start = jnp.zeros((), jnp.int32)
    while produced < gcfg.max_new_tokens:
        if bool(np.all(np.asarray(carry[2]))):  # all done
            break
        step = min(chunk, gcfg.max_new_tokens - produced)
        carry, toks = _decode_chunk_jit(params, cfg, gcfg, step, carry,
                                        prompt_len, start)
        yield np.asarray(toks)
        produced += step
        start = start + step


def truncate_at_stops(gen: np.ndarray, gcfg: GenerationConfig) -> np.ndarray:
    """Pad everything from the first EOS token / stop sequence onward."""
    if not (gcfg.eos_token_ids or gcfg.stop_sequences):
        return gen
    out = np.full_like(gen, gcfg.pad_token_id)
    for bi in range(gen.shape[0]):
        row = gen[bi]
        end = row.shape[0]
        if gcfg.eos_token_ids:
            stop = np.isin(row, gcfg.eos_token_ids).nonzero()[0]
            if stop.size:
                end = int(stop[0])
        for seq in gcfg.stop_sequences:
            s = np.asarray(seq)
            for pos in range(0, end - len(s) + 1):
                if np.array_equal(row[pos:pos + len(s)], s):
                    end = pos
                    break
        out[bi, :end] = row[:end]
    return out


def decode_texts(tokenizer, gen_ids: np.ndarray, pad_token_id: int = 0,
                 skip_special_tokens: bool = True) -> Sequence[str]:
    texts = []
    for row in gen_ids:
        ids = [int(t) for t in row if int(t) != pad_token_id]
        texts.append(tokenizer.decode(ids, skip_special_tokens=skip_special_tokens))
    return texts
