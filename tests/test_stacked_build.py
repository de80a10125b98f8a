"""Direct-into-stacked int8 tree building (the bench.py flagship pattern).

bench.py builds the 7B teacher by initializing+quantizing each layer inside
jit and writing it into a donated pre-stacked buffer (peak = final tree +
one layer) instead of init-whole -> quantize -> stack (3 full-tree
transients).  This test pins the pattern against decoder layout drift: the
fill-built tree must have the same treedef/shapes/dtypes as the
quantize_decoder_int8 + stack_layers path, and must run the forward.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.llm.config import tiny_config
import pytest

pytestmark = pytest.mark.slow  # compile-heavy numerics; -m "not slow" skips


def _fill_built(cfg, key, dtype):
    """The bench.py big-teacher build, on a tiny config."""
    def q_layer(lk):
        # mirror of bench.py::_q_layer — the FUSED int8 layout
        # (quantize_decoder_int8 fuse=True): wq|wk|wv -> 'wqkv',
        # gate|up -> 'gate_up'
        lp = decoder.init_layer(cfg, lk, dtype=dtype)
        attn = {k: v for k, v in lp["attn"].items()
                if k not in ("wq", "wk", "wv", "wo")}
        attn["wqkv"] = decoder.quantize_dense_int8(jnp.concatenate(
            [lp["attn"]["wq"], lp["attn"]["wk"], lp["attn"]["wv"]], axis=1))
        attn["wo"] = decoder.quantize_dense_int8(lp["attn"]["wo"])
        mlp = {k: v for k, v in lp["mlp"].items()
               if k not in ("gate", "up", "down")}
        mlp["gate_up"] = decoder.quantize_dense_int8(jnp.concatenate(
            [lp["mlp"]["gate"], lp["mlp"]["up"]], axis=1))
        mlp["down"] = decoder.quantize_dense_int8(lp["mlp"]["down"])
        return {**lp, "attn": attn, "mlp": mlp}

    tk = jax.random.split(key, cfg.num_layers + 3)
    lshape = jax.eval_shape(q_layer, tk[1])
    stacked = jax.tree_util.tree_map(
        lambda sh: jnp.zeros((cfg.num_layers,) + sh.shape, sh.dtype), lshape)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, lk, i):
        return jax.tree_util.tree_map(
            lambda b_, leaf: jax.lax.dynamic_update_index_in_dim(
                b_, leaf, i, 0), buf, q_layer(lk))

    for i in range(cfg.num_layers):
        stacked = fill(stacked, tk[i + 1], jnp.int32(i))

    head = decoder.quantize_head_int8(
        jax.random.normal(tk[0], (cfg.vocab_size, cfg.hidden_size),
                          jnp.float32) * 0.02)
    embed = {**decoder.quantize_head_int8(
        jax.random.normal(tk[-1], (cfg.vocab_size, cfg.hidden_size),
                          jnp.float32) * 0.02),
        "dtype_ref": jnp.zeros((0,), dtype)}
    return {
        "embed": {"embedding": embed},
        "layers": {"stacked": [stacked]},
        "final_norm": {"weight": jnp.ones((cfg.hidden_size,), dtype)},
        "lm_head": {"weight": head},
    }


def test_fill_built_tree_matches_quantize_then_stack_layout():
    cfg = tiny_config(num_layers=4, hidden_size=32, intermediate_size=64,
                      vocab_size=128, tie_word_embeddings=False)
    assert decoder._layer_period(cfg) == 1
    dtype = jnp.float32

    built = _fill_built(cfg, jax.random.PRNGKey(0), dtype)

    ref = decoder.init(cfg, jax.random.PRNGKey(1), dtype=dtype)
    ref = decoder.quantize_decoder_int8(ref, include_lm_head=True,
                                        include_embed=True)
    ref = decoder.stack_layers(cfg, ref)

    t1 = jax.tree_util.tree_structure(built)
    t2 = jax.tree_util.tree_structure(ref)
    assert t1 == t2, f"{t1}\n!=\n{t2}"
    for a, b in zip(jax.tree_util.tree_leaves(built),
                    jax.tree_util.tree_leaves(ref)):
        assert a.shape == b.shape and a.dtype == b.dtype, (a, b)


def test_fill_built_tree_runs_forward():
    cfg = tiny_config(num_layers=4, hidden_size=32, intermediate_size=64,
                      vocab_size=128, tie_word_embeddings=False)
    built = _fill_built(cfg, jax.random.PRNGKey(0), jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 128, (2, 16)))
    seg = jnp.ones((2, 16), jnp.int32)
    out = decoder.forward(built, cfg, input_ids=ids, segment_ids=seg,
                          train=False)
    logits = decoder.logits_from_hidden(built, cfg, out.hidden)
    assert logits.shape == (2, 16, 128)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_fill_matches_unstacked_per_layer_values():
    """Filling layer i with key k equals initializing layer i with key k:
    the donated dynamic-update writes land in the right slots."""
    cfg = tiny_config(num_layers=3, hidden_size=16, intermediate_size=32,
                      vocab_size=64, tie_word_embeddings=False)
    built = _fill_built(cfg, jax.random.PRNGKey(0), jnp.float32)
    tk = jax.random.split(jax.random.PRNGKey(0), cfg.num_layers + 3)
    for i in range(cfg.num_layers):
        lp = decoder.init_layer(cfg, tk[i + 1], dtype=jnp.float32)
        want = decoder.quantize_dense_int8(jnp.concatenate(
            [lp["attn"]["wq"], lp["attn"]["wk"], lp["attn"]["wv"]], axis=1))
        got = jax.tree_util.tree_map(
            lambda x: x[i], built["layers"]["stacked"][0])
        np.testing.assert_array_equal(
            np.asarray(got["attn"]["wqkv"]["w_int8"]),
            np.asarray(want["w_int8"]))
