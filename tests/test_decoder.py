"""Decoder model tests: shapes, KV-cache decode parity, MoE upcycling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.llm.config import tiny_config
from llavamod_tpu.models.llm.upcycle import activated_params, moe_layer_indices, upcycle

CFG = tiny_config()

# Eager per-op dispatch compiles each distinct op shape (~0.4s each on this
# CPU stack); jit the whole forward instead.
_fwd = jax.jit(
    lambda params, ids, seg=None, train=False, cfg=CFG: decoder.forward(
        params, cfg, input_ids=ids, segment_ids=seg, train=train),
    static_argnames=("train", "cfg"))


def _params():
    return decoder.init(CFG, jax.random.PRNGKey(0))


def test_forward_shapes():
    params = _params()
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, CFG.vocab_size)
    out = decoder.forward(params, CFG, input_ids=ids)
    assert out.hidden.shape == (2, 16, CFG.hidden_size)
    logits = decoder.logits_from_hidden(params, CFG, out.hidden)
    assert logits.shape == (2, 16, CFG.vocab_size)


def test_padding_invariance():
    """Padding tokens (segment 0) must not affect real-token hidden states."""
    params = _params()
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, CFG.vocab_size)
    seg = jnp.ones((1, 8), jnp.int32)
    out_short = _fwd(params, ids, seg)

    ids_padded = jnp.concatenate([ids, jnp.zeros((1, 4), ids.dtype)], axis=1)
    seg_padded = jnp.concatenate([seg, jnp.zeros((1, 4), jnp.int32)], axis=1)
    out_padded = _fwd(params, ids_padded, seg_padded)
    np.testing.assert_allclose(out_padded.hidden[:, :8], out_short.hidden,
                               rtol=1e-4, atol=1e-5)


def test_kv_cache_decode_matches_full_forward():
    params = _params()
    t = 12
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, t), 0, CFG.vocab_size)
    full = _fwd(params, ids)

    step = jax.jit(lambda p, i, c: decoder.forward(p, CFG, input_ids=i, cache=c))
    # prefill 8, then decode 4 one at a time
    cache = decoder.init_cache(CFG, 2, max_len=16, dtype=jnp.float32)
    out = step(params, ids[:, :8], cache)
    hiddens = [out.hidden]
    cache = out.cache
    for i in range(8, t):
        out = step(params, ids[:, i:i + 1], cache)
        hiddens.append(out.hidden)
        cache = out.cache
    stitched = jnp.concatenate(hiddens, axis=1)
    np.testing.assert_allclose(stitched, full.hidden, rtol=2e-3, atol=2e-4)


def test_moe_layer_indices():
    assert moe_layer_indices("sparse", 8) == (0, 2, 4, 6)
    assert moe_layer_indices("first_half", 8) == (0, 1, 2, 3)
    assert moe_layer_indices("second_half", 8) == (4, 5, 6, 7)
    assert moe_layer_indices("dense", 4) == (0, 1, 2, 3)
    assert moe_layer_indices("custom", 8, explicit=[1, 5]) == (1, 5)


def test_upcycle_preserves_function_at_init():
    """With a zero-init router, top-2 gating splits every token between two
    identical experts whose combined (renormalized) output equals the dense
    MLP — so the upcycled model must reproduce the dense forward exactly."""
    params = _params()
    moe_cfg, moe_params = upcycle(CFG, params, moe_mode="sparse",
                                  num_experts=4, top_k=2,
                                  capacity_factor=8.0)
    assert moe_cfg.moe_layers == (0,)
    # expert weights are exact copies
    dense_up = params["layers"][0]["mlp"]["up"]
    experts_up = moe_params["layers"][0]["mlp"]["experts"]["up"]
    for e in range(4):
        np.testing.assert_array_equal(experts_up[e], dense_up)

    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 0, CFG.vocab_size)
    seg = jnp.ones((2, 16), jnp.int32)
    dense_out = _fwd(params, ids, seg)
    moe_out = _fwd(moe_params, ids, seg, train=True, cfg=moe_cfg)
    np.testing.assert_allclose(moe_out.hidden, dense_out.hidden,
                               rtol=1e-4, atol=1e-5)
    assert len(moe_out.moe_losses) == 1


def test_upcycle_dense_params_untouched():
    params = _params()
    _, moe_params = upcycle(CFG, params, moe_mode="sparse", num_experts=2)
    # non-MoE layer unchanged (same arrays)
    assert moe_params["layers"][1]["mlp"]["up"] is params["layers"][1]["mlp"]["up"]
    # original tree still has its dense mlp at layer 0
    assert "router" not in params["layers"][0]["mlp"]


def test_activated_params_counts():
    base = activated_params(CFG)
    moe_cfg, _ = upcycle(CFG, _params(), moe_mode="sparse", num_experts=4, top_k=2)
    moe = activated_params(moe_cfg)
    # top-2 of 4 experts: one extra activated FFN per MoE layer
    extra_ffn = 3 * CFG.hidden_size * CFG.intermediate_size
    router = CFG.hidden_size * 4
    assert moe - base == len(moe_cfg.moe_layers) * (extra_ffn + router)


def test_gemma_style_flags():
    cfg = tiny_config(norm_offset=1.0, attn_logit_softcap=30.0,
                      final_logit_softcap=20.0, post_attn_norm=True,
                      post_mlp_norm=True, embed_scale=8.0,
                      activation="gelu_tanh")
    params = decoder.init(cfg, jax.random.PRNGKey(5))
    ids = jnp.zeros((1, 4), jnp.int32)
    out = _fwd(params, ids, cfg=cfg)
    logits = jax.jit(decoder.logits_from_hidden, static_argnums=1)(params, cfg, out.hidden)
    assert float(jnp.abs(logits).max()) <= 20.0


def test_layernorm_parallel_block():
    cfg = tiny_config(norm="layernorm", parallel_block=True, gated_mlp=False,
                      mlp_bias=True, o_bias=True, partial_rotary_factor=0.5)
    params = decoder.init(cfg, jax.random.PRNGKey(6))
    ids = jnp.zeros((1, 4), jnp.int32)
    out = _fwd(params, ids, cfg=cfg)
    assert np.isfinite(np.asarray(out.hidden)).all()


def test_dynamic_ntk_and_logn_identity_below_train_context():
    """Qwen-1.0 long-context scaling (modeling_qwen.py:286-298,481-491) must
    be a no-op while positions stay within rope_seq_length."""
    cfg_q = CFG.replace(use_dynamic_ntk=True, use_logn_attn=True,
                        rope_seq_length=64)
    params = _params()
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, CFG.vocab_size)
    base = decoder.forward(params, CFG, input_ids=ids).hidden
    scaled = decoder.forward(params, cfg_q, input_ids=ids).hidden
    np.testing.assert_allclose(np.asarray(base), np.asarray(scaled),
                               rtol=0, atol=0)


def test_dynamic_ntk_matches_manually_scaled_theta():
    """Beyond the training context, dynamic NTK == a plain config whose
    rope_theta is pre-multiplied by alpha^(r/(r-2))."""
    l0, t = 8, 32
    cfg_ntk = CFG.replace(use_dynamic_ntk=True, rope_seq_length=l0)
    # expected alpha for true_len=32: ceil(log2(32/8)+1)=3 -> 2^3-1=7
    rdim = CFG.rotary_dim
    theta = CFG.rope_theta * 7.0 ** (rdim / (rdim - 2))
    cfg_manual = CFG.replace(rope_theta=theta)
    params = _params()
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, t), 0, CFG.vocab_size)
    a = decoder.forward(params, cfg_ntk, input_ids=ids).hidden
    b = decoder.forward(params, cfg_manual, input_ids=ids).hidden
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_logn_attn_scales_only_positions_past_train_context():
    """logn query scaling is per-position: with causal attention, outputs at
    positions < rope_seq_length are bit-identical to the unscaled model,
    while later positions change."""
    l0, t = 8, 32
    cfg_logn = CFG.replace(use_logn_attn=True, rope_seq_length=l0)
    params = _params()
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, t), 0, CFG.vocab_size)
    base = np.asarray(decoder.forward(params, CFG, input_ids=ids).hidden)
    got = np.asarray(decoder.forward(params, cfg_logn, input_ids=ids).hidden)
    np.testing.assert_array_equal(base[:, :l0], got[:, :l0])
    assert np.abs(base[:, l0 + 1:] - got[:, l0 + 1:]).max() > 1e-6


@pytest.mark.slow
def test_moe_remat_policy_is_value_and_grad_identical():
    """remat_policy='moe' (checkpoint only the sparse-FFN block) must not
    change values or gradients — it is purely a memory/recompute trade."""
    cfg_moe, params_moe = None, None
    base = tiny_config(num_layers=2, hidden_size=32, intermediate_size=64,
                       vocab_size=128)
    params = decoder.init(base, jax.random.PRNGKey(0))
    cfg_moe, params_moe = upcycle(base, params, moe_mode="sparse",
                                  num_experts=4, top_k=2)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)

    def loss(p, c):
        out = decoder.forward(p, c, input_ids=ids, train=True)
        return jnp.sum(out.hidden ** 2) + out.aux_loss

    l0, g0 = jax.value_and_grad(loss)(params_moe, cfg_moe)
    l1, g1 = jax.value_and_grad(loss)(
        params_moe, cfg_moe.replace(remat_policy="moe"))
    assert float(l0) == float(l1)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


@pytest.mark.slow
def test_scan_layers_decode_matches_inline():
    """Opt-in cached-path layer scan (scan_layers_decode=True) is
    numerically identical to the inline decode loop, MoE + int8 cache
    included."""
    import numpy as np

    from llavamod_tpu.models.llm.config import tiny_config

    base = tiny_config(num_layers=4, moe_num_experts=4, moe_top_k=2,
                       moe_layers=(1, 3))
    params = decoder.init(base, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, size=(2, 6)))

    for cache_dtype in (jnp.bfloat16, "int8"):
        outs = []
        for scan_dec in (False, True):
            cfg = base.replace(scan_layers_decode=scan_dec)
            cache = decoder.init_cache(cfg, 2, 16, dtype=cache_dtype)
            out = decoder.forward(params, cfg, input_ids=ids, cache=cache,
                                  train=False)
            # one decode step on top
            step = decoder.forward(params, cfg,
                                   input_ids=ids[:, :1] + 1,
                                   cache=out.cache, train=False)
            outs.append((out.hidden, out.cache, step.hidden))
        (h0, c0, s0), (h1, c1, s1) = outs
        # same math, different XLA fusion order: fp32 reassociation, and
        # int8 cache values on a rounding boundary can flip one step --
        # tolerances catch layout/order bugs (O(1) errors), not quant noise
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h1),
                                   rtol=1e-2, atol=2e-3)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-2, atol=2e-3)
        np.testing.assert_allclose(np.asarray(c0.k, np.float32),
                                   np.asarray(c1.k, np.float32),
                                   rtol=1e-2, atol=1.0)
        np.testing.assert_array_equal(np.asarray(c0.segment),
                                      np.asarray(c1.segment))


@pytest.mark.slow
def test_int8_expert_serving_quantization():
    """quantize_decoder_int8(include_experts=True): W8A8 sparse student —
    forward stays close to float, and cached decode runs on the int8 tree."""
    import numpy as np

    from llavamod_tpu.models.llm.config import tiny_config

    cfg = tiny_config(num_layers=4, moe_num_experts=4, moe_top_k=2,
                      moe_layers=(1, 3), tie_word_embeddings=True)
    params = decoder.init(cfg, jax.random.PRNGKey(0))
    # non-degenerate weights
    params = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(
            jax.random.PRNGKey(hash(str(x.shape)) % 2**31), x.shape)
        if x.ndim >= 2 else x, params)

    qparams = decoder.quantize_decoder_int8(params, include_lm_head=True,
                                            include_experts=True)
    # experts actually quantized
    moe_mlp = qparams["layers"][1]["mlp"]
    assert "w_int8" in moe_mlp["experts"]["up"]
    assert moe_mlp["experts"]["up"]["w_int8"].dtype == jnp.int8

    ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, size=(2, 8)))
    ref = decoder.forward(params, cfg, input_ids=ids, train=False)
    got = decoder.forward(qparams, cfg, input_ids=ids, train=False)
    ref_l = np.asarray(decoder.logits_from_hidden(params, cfg, ref.hidden))
    got_l = np.asarray(decoder.logits_from_hidden(qparams, cfg, got.hidden))
    # W8A8 error budget: logits track the float model closely (random
    # untrained weights overstate quant error vs a real checkpoint)
    assert np.max(np.abs(ref_l - got_l)) < 0.5
    assert np.corrcoef(ref_l.ravel(), got_l.ravel())[0, 1] > 0.995

    # cached decode path runs on the quantized tree
    cache = decoder.init_cache(cfg, 2, 16, dtype="int8")
    out = decoder.forward(qparams, cfg, input_ids=ids, cache=cache,
                          train=False)
    step = decoder.forward(qparams, cfg, input_ids=ids[:, :1],
                           cache=out.cache, train=False)
    assert np.isfinite(np.asarray(step.hidden, np.float32)).all()


@pytest.mark.slow
def test_stack_layers_roundtrip_and_forward_equivalence():
    """Pre-stacked layer trees: same outputs, gradients flow, and
    unstack restores the exact per-layer list."""
    import numpy as np

    from llavamod_tpu.models.llm.config import tiny_config

    cfg = tiny_config(num_layers=4, moe_num_experts=4, moe_top_k=2,
                      moe_layers=(1, 3))
    params = decoder.init(cfg, jax.random.PRNGKey(0))
    stacked = decoder.stack_layers(cfg, params)
    assert decoder.is_stacked(stacked) and not decoder.is_stacked(params)

    # round trip is exact
    back = decoder.unstack_layers(cfg, stacked)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, size=(2, 8)))
    ref = decoder.forward(params, cfg, input_ids=ids, train=True)
    got = decoder.forward(stacked, cfg, input_ids=ids, train=True)
    np.testing.assert_allclose(np.asarray(ref.hidden), np.asarray(got.hidden),
                               rtol=1e-5, atol=1e-6)

    # gradients flow through the stacked tree
    def loss(p):
        out = decoder.forward(p, cfg, input_ids=ids, train=True)
        return jnp.sum(out.hidden.astype(jnp.float32) ** 2) + out.aux_loss

    grads = jax.grad(loss)(stacked)
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

    # cache path refuses stacked trees with a clear error
    cache = decoder.init_cache(cfg, 2, 16)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unstack"):
        decoder.forward(stacked, cfg, input_ids=ids, cache=cache)


def test_int8_embedding_table():
    """quantize_decoder_int8(include_embed=True): int8 table dequantized on
    gather; tied models still produce logits via the int8 head copy."""
    import numpy as np

    from llavamod_tpu.models.llm.config import tiny_config

    for tied in (False, True):
        cfg = tiny_config(tie_word_embeddings=tied)
        params = decoder.init(cfg, jax.random.PRNGKey(0))
        q = decoder.quantize_decoder_int8(params, include_lm_head=True,
                                          include_embed=True)
        assert "w_int8" in q["embed"]["embedding"]
        ids = jnp.asarray(np.random.RandomState(0).randint(0, 512,
                                                           size=(2, 6)))
        e_ref = np.asarray(decoder.embed(params, cfg, ids), np.float32)
        e_q = np.asarray(decoder.embed(q, cfg, ids), np.float32)
        # per-row int8: <1% relative error on gathered rows
        denom = np.maximum(np.abs(e_ref).max(), 1e-6)
        assert np.abs(e_q - e_ref).max() / denom < 0.02
        out = decoder.forward(q, cfg, input_ids=ids, train=False)
        logits = decoder.logits_from_hidden(q, cfg, out.hidden)
        assert np.isfinite(np.asarray(logits, np.float32)).all()
