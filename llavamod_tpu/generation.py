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


@functools.partial(jax.jit, static_argnums=(1, 3))
def _generate_jit(params, cfg: LlavaConfig, batch: MultimodalBatch,
                  gcfg: GenerationConfig, rng) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, t = batch.input_ids.shape
    total = t + gcfg.max_new_tokens
    cache_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                   "int8": "int8"}[gcfg.cache_dtype]

    # segment-aware positions: 0 at each sequence's first real token
    seg = batch.segment_ids
    positions = jnp.maximum(jnp.cumsum(seg, axis=1) - 1, 0)
    prompt_len = jnp.sum(seg, axis=1)  # [B] real lengths

    cache = decoder.init_cache(cfg.llm, b, total, dtype=cache_dtype)
    out = llava.forward(params, cfg, batch._replace(positions=positions),
                        cache=cache, train=False)
    last_logits = llava.logits(params, cfg, out.hidden[:, -1:])[:, 0]

    eos = jnp.asarray(gcfg.eos_token_ids, jnp.int32) if gcfg.eos_token_ids \
        else jnp.zeros((0,), jnp.int32)
    # rolling window of the last W generated tokens for multi-token stops
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

    rng0, rng_loop = jax.random.split(rng)
    first_tok = _sample(last_logits, gcfg, rng0)
    window0 = push_window(jnp.full((b, win), -1, jnp.int32), first_tok)
    done0 = is_eos(first_tok) | window_stopped(window0)

    def body(carry, i):
        cache, tok, done, window, key = carry
        key, sub = jax.random.split(key)
        step_batch = MultimodalBatch(
            input_ids=tok[:, None],
            segment_ids=jnp.ones((b, 1), jnp.int32),
            image_mask=jnp.zeros((b, 1), bool),
            image_pos=jnp.zeros((b, 1), jnp.int32),
            pixels=jnp.zeros((b, 0) + batch.pixels.shape[2:], batch.pixels.dtype),
            pixel_valid=jnp.zeros((b, 0), bool),
            positions=(prompt_len + i)[:, None],
        )
        emb = decoder.embed(params["llm"], cfg.llm, step_batch.input_ids)
        dout = decoder.forward(params["llm"], cfg.llm, inputs_embeds=emb,
                               positions=step_batch.positions,
                               segment_ids=step_batch.segment_ids,
                               cache=cache, train=False)
        logits = llava.logits(params, cfg, dout.hidden[:, -1:])[:, 0]
        nxt = _sample(logits, gcfg, sub)
        nxt = jnp.where(done, gcfg.pad_token_id, nxt)
        new_window = push_window(window, nxt)
        new_done = done | is_eos(nxt) | window_stopped(new_window)
        return (dout.cache, nxt, new_done, new_window, key), tok

    (cache, last_tok, done, _, _), toks = jax.lax.scan(
        body, (out.cache, first_tok, done0, window0, rng_loop),
        jnp.arange(gcfg.max_new_tokens))
    # toks[i] is the token EMITTED at step i-1's carry => sequence of inputs;
    # append the final carry token.
    gen = jnp.concatenate([jnp.swapaxes(toks, 0, 1), last_tok[:, None]], axis=1)
    return gen[:, :gcfg.max_new_tokens], done


def generate(params, cfg: LlavaConfig, batch: MultimodalBatch,
             gcfg: GenerationConfig, rng=None) -> np.ndarray:
    """Returns generated ids [B, max_new_tokens] (pad after EOS)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    gen, _ = _generate_jit(params, cfg, batch, gcfg, rng)
    return truncate_at_stops(np.asarray(gen), gcfg)


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
