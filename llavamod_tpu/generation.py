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
    cache_dtype = jnp.bfloat16 if gcfg.cache_dtype == "bfloat16" else jnp.float32

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

    def is_eos(tok):
        if eos.shape[0] == 0:
            return jnp.zeros_like(tok, dtype=bool)
        return jnp.any(tok[:, None] == eos[None, :], axis=-1)

    rng0, rng_loop = jax.random.split(rng)
    first_tok = _sample(last_logits, gcfg, rng0)
    done0 = is_eos(first_tok)

    def body(carry, i):
        cache, tok, done, key = carry
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
        new_done = done | is_eos(nxt)
        return (dout.cache, nxt, new_done, key), tok

    (cache, last_tok, done, _), toks = jax.lax.scan(
        body, (out.cache, first_tok, done0, rng_loop),
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
    gen = np.asarray(gen)
    # zero-out everything after (and including nothing before) EOS
    if gcfg.eos_token_ids:
        out = np.full_like(gen, gcfg.pad_token_id)
        for bi in range(gen.shape[0]):
            row = gen[bi]
            stop = np.isin(row, gcfg.eos_token_ids).nonzero()[0]
            end = stop[0] if stop.size else row.shape[0]
            out[bi, :end] = row[:end]
        gen = out
    return gen


def decode_texts(tokenizer, gen_ids: np.ndarray, pad_token_id: int = 0,
                 skip_special_tokens: bool = True) -> Sequence[str]:
    texts = []
    for row in gen_ids:
        ids = [int(t) for t in row if int(t) != pad_token_id]
        texts.append(tokenizer.decode(ids, skip_special_tokens=skip_special_tokens))
    return texts
