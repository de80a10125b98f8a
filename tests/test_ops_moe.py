"""Unit tests for top-k gating and MoE dispatch (DeepSpeed-parity semantics)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from llavamod_tpu.ops.moe import GatingConfig, moe_ffn, top_k_gating

pytestmark = pytest.mark.slow  # compile-heavy numerics; -m "not slow" skips


def test_capacity_formula():
    cfg = GatingConfig(num_experts=4, top_k=2, capacity_factor=1.5,
                       eval_capacity_factor=2.0, min_capacity=4)
    # ceil(16/4 * 1.5 * 2) = 12
    assert cfg.capacity(16, train=True) == 12
    assert cfg.capacity(16, train=False) == 16
    assert cfg.capacity(2, train=True) == 4  # min_capacity floor


def test_top1_every_token_routed_when_capacity_ample():
    s, e = 16, 4
    cfg = GatingConfig(num_experts=e, top_k=1, capacity_factor=4.0)
    logits = jax.random.normal(jax.random.PRNGKey(0), (s, e))
    out = top_k_gating(logits, cfg, train=True)
    # every token dispatched exactly once
    np.testing.assert_allclose(out.dispatch.sum(axis=(1, 2)), np.ones(s))
    # combine weight is the RAW top-1 softmax prob (DeepSpeed top1gating
    # does not renormalize; see tests/test_moe_golden.py)
    top1 = np.max(np.asarray(jax.nn.softmax(logits, axis=-1)), axis=-1)
    np.testing.assert_allclose(out.combine.sum(axis=(1, 2)), top1, rtol=1e-6)


def test_top2_combine_weights_renormalized():
    s, e = 8, 4
    cfg = GatingConfig(num_experts=e, top_k=2, capacity_factor=8.0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (s, e))
    out = top_k_gating(logits, cfg, train=True)
    # each token goes to exactly 2 slots; combine sums to 1 (renormalized)
    np.testing.assert_allclose(out.dispatch.sum(axis=(1, 2)), 2 * np.ones(s))
    np.testing.assert_allclose(out.combine.sum(axis=(1, 2)), np.ones(s), rtol=1e-5)
    # dispatched expert/slot pairs match combine support
    assert np.all((out.combine > 0) <= (out.dispatch > 0))


def test_capacity_dropping():
    # all tokens prefer expert 0; capacity forces drops
    s, e = 8, 2
    cfg = GatingConfig(num_experts=e, top_k=1, deterministic_capacity=3)
    logits = jnp.stack([jnp.full((s,), 5.0), jnp.full((s,), -5.0)], axis=1)
    out = top_k_gating(logits, cfg, train=True)
    kept = out.dispatch[:, 0, :].sum()
    assert kept == 3  # only `capacity` tokens kept
    # first 3 tokens (cumsum order) survive, later ones dropped
    np.testing.assert_allclose(out.dispatch.sum(axis=(1, 2)),
                               [1, 1, 1, 0, 0, 0, 0, 0])


def test_slot_positions_unique_per_expert():
    s, e = 32, 4
    cfg = GatingConfig(num_experts=e, top_k=2, capacity_factor=2.0)
    logits = jax.random.normal(jax.random.PRNGKey(2), (s, e))
    out = top_k_gating(logits, cfg, train=True)
    # no slot may receive two tokens
    slot_use = out.dispatch.sum(axis=0)  # [E, C]
    assert slot_use.max() <= 1.0 + 1e-6


def test_second_choice_placed_after_first():
    # DeepSpeed parity: choice-2 tokens consume capacity after all choice-1
    s, e = 4, 2
    cfg = GatingConfig(num_experts=e, top_k=2, deterministic_capacity=8)
    # tokens 0,1: expert0 strongly first; tokens 2,3: expert1 first, expert0 second
    logits = jnp.array([[5.0, -5.0], [5.0, -5.0], [-5.0, 5.0], [-5.0, 5.0]])
    out = top_k_gating(logits, cfg, train=True)
    d0 = np.array(out.dispatch[:, 0, :])  # expert-0 slots
    # tokens 0,1 occupy slots 0,1 (first choice); tokens 2,3 slots 2,3 (second)
    assert d0[0, 0] == 1 and d0[1, 1] == 1
    assert d0[2, 2] == 1 and d0[3, 3] == 1


def test_aux_loss_uniform_router():
    s, e = 64, 4
    cfg = GatingConfig(num_experts=e, top_k=2, capacity_factor=8.0)
    logits = jnp.zeros((s, e))
    out = top_k_gating(logits, cfg, train=True)
    # uniform gates: me = 1/E; argmax ties -> all to expert 0: ce = onehot
    # aux = E^2 * mean(me*ce) = E^2 * (1/E * 1)/E = 1
    np.testing.assert_allclose(out.aux_loss, 1.0, rtol=1e-5)


def test_padding_tokens_excluded():
    s, e = 8, 2
    cfg = GatingConfig(num_experts=e, top_k=1, deterministic_capacity=8)
    logits = jax.random.normal(jax.random.PRNGKey(3), (s, e))
    valid = jnp.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    out = top_k_gating(logits, cfg, train=True, token_valid=valid)
    np.testing.assert_allclose(out.dispatch[4:].sum(), 0.0)


def test_moe_ffn_identity_experts():
    s, d, e = 8, 4, 2
    cfg = GatingConfig(num_experts=e, top_k=2, capacity_factor=4.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (s, d))
    logits = jax.random.normal(jax.random.PRNGKey(5), (s, e))
    out = top_k_gating(logits, cfg, train=True)
    y = moe_ffn(x, out.dispatch, out.combine, lambda xe: xe)  # identity experts
    # identity experts + combine weights summing to 1 => y == x
    np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-6)


def test_gating_grad_flows_to_router():
    s, e = 8, 4
    cfg = GatingConfig(num_experts=e, top_k=2, capacity_factor=4.0)
    x = jax.random.normal(jax.random.PRNGKey(6), (s, 4))

    def f(logits):
        out = top_k_gating(logits, cfg, train=True)
        y = moe_ffn(x, out.dispatch, out.combine, lambda xe: xe * 2.0)
        return jnp.sum(y ** 2) + 0.01 * out.aux_loss

    logits = jax.random.normal(jax.random.PRNGKey(7), (s, e))
    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_grouped_gating_matches_global_when_capacity_ample():
    """moe_gating_group_size splits tokens into independent gating groups
    (DeepSpeed per-rank semantics); with no capacity drops the outputs are
    identical to global gating."""
    from llavamod_tpu.models.llm import decoder
    from llavamod_tpu.models.llm.config import tiny_config
    from llavamod_tpu.models.llm.upcycle import upcycle

    base = tiny_config(num_layers=2, hidden_size=32, intermediate_size=64)
    cfg0, params = upcycle(base, decoder.init(base, jax.random.PRNGKey(0)),
                           moe_mode="dense", num_experts=4, top_k=2,
                           capacity_factor=8.0, eval_capacity_factor=8.0)
    cfg_grouped = cfg0.replace(moe_gating_group_size=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32))
    layer = params["layers"][0]
    y0, a0, p0 = decoder.moe_block_forward(cfg0, layer["mlp"], x, True, None)
    y1, a1, p1 = decoder.moe_block_forward(cfg_grouped, layer["mlp"], x,
                                           True, None)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p0),
                               np.asarray(p1).reshape(np.asarray(p0).shape),
                               rtol=1e-6, atol=1e-7)
    assert np.isfinite(float(a1))


def test_grouped_gating_capacity_is_per_group():
    """With a tight capacity, drops happen within each group independently:
    a hot expert in one group cannot starve tokens of another group."""
    from llavamod_tpu.models.llm import decoder
    from llavamod_tpu.models.llm.config import tiny_config
    from llavamod_tpu.models.llm.upcycle import upcycle

    base = tiny_config(num_layers=2, hidden_size=32, intermediate_size=64)
    cfg0, params = upcycle(base, decoder.init(base, jax.random.PRNGKey(0)),
                           moe_mode="dense", num_experts=2, top_k=1,
                           capacity_factor=1.0, min_capacity=1)
    cfg_g = cfg0.replace(moe_gating_group_size=8)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32))
    y, aux, probs = decoder.moe_block_forward(cfg_g, params["layers"][0]["mlp"],
                                              x, True, None)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


class TestGatherDispatch:
    """moe_ffn_gather(+_grouped) == the one-hot einsum path, bit-for-bit:
    same drops, same renormalized weights, identical gradients."""

    def _setup(self, s=64, e=4, d=16, k=2, seed=0):
        from llavamod_tpu.ops.moe import GatingConfig

        rng = np.random.default_rng(seed)
        cfg = GatingConfig(num_experts=e, top_k=k, capacity_factor=1.2,
                           min_capacity=4)
        logits = jnp.asarray(rng.normal(size=(s, e)), jnp.float32) * 2
        x = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
        tv = jnp.asarray(rng.random(s) > 0.1)
        w_up = jnp.asarray(rng.normal(size=(e, d, 32)) * 0.2, jnp.float32)
        w_dn = jnp.asarray(rng.normal(size=(e, 32, d)) * 0.2, jnp.float32)

        def expert_fn(xe):
            h = jax.nn.gelu(jnp.einsum("ecd,edf->ecf", xe, w_up))
            return jnp.einsum("ecf,efd->ecd", h, w_dn)

        return cfg, logits, x, tv, expert_fn

    @pytest.mark.parametrize("top_k", [1, 2])
    def test_matches_einsum_path(self, top_k):
        from llavamod_tpu.ops.moe import (moe_ffn, moe_ffn_gather,
                                          top_k_gating, top_k_gating_compact)

        import dataclasses

        cfg, logits, x, tv, expert_fn = self._setup(k=top_k)
        cfg = dataclasses.replace(cfg, top_k=top_k)

        def f_ein(x, logits):
            g = top_k_gating(logits, cfg, train=True, token_valid=tv)
            return jnp.sum(moe_ffn(x, g.dispatch, g.combine, expert_fn))

        def f_gat(x, logits):
            c = top_k_gating_compact(logits, cfg, train=True, token_valid=tv)
            return jnp.sum(moe_ffn_gather(
                x, c, cfg.num_experts, cfg.capacity(x.shape[0], True),
                expert_fn))

        y0, g0 = jax.value_and_grad(f_ein, argnums=(0, 1))(x, logits)
        y1, g1 = jax.value_and_grad(f_gat, argnums=(0, 1))(x, logits)
        assert float(y0) == pytest.approx(float(y1), rel=1e-6)
        np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                                   atol=1e-5)

    def test_grouped_matches_einsum_layout(self):
        from llavamod_tpu.ops.moe import (moe_ffn_gather_grouped,
                                          top_k_gating, top_k_gating_compact)

        cfg, logits, x, tv, expert_fn = self._setup()
        g, grp, e = 2, 32, cfg.num_experts
        lg = logits.reshape(g, grp, e)
        tvg = tv.reshape(g, grp)
        comp = jax.vmap(lambda l, v: top_k_gating_compact(
            l, cfg, train=True, token_valid=v))(lg, tvg)
        cap = cfg.capacity(grp, True)
        got = moe_ffn_gather_grouped(x, comp, e, cap, grp, expert_fn)

        gate = jax.vmap(lambda l, v: top_k_gating(
            l, cfg, train=True, token_valid=v))(lg, tvg)
        xg = x.reshape(g, grp, -1)
        xe = jnp.einsum("gsec,gsd->gecd", gate.dispatch, xg)
        xe = xe.transpose(1, 0, 2, 3).reshape(e, g * cap, -1)
        ye = expert_fn(xe).reshape(e, g, cap, -1).transpose(1, 0, 2, 3)
        ref = jnp.einsum("gsec,gecd->gsd", gate.combine, ye).reshape(
            x.shape[0], -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_decoder_moe_block_gather_equals_einsum(self):
        from llavamod_tpu.models.llm import decoder
        from llavamod_tpu.models.llm.config import tiny_config
        from llavamod_tpu.models.llm.upcycle import upcycle

        cfg = tiny_config(num_layers=2, hidden_size=32, intermediate_size=64,
                          vocab_size=128)
        params = decoder.init(cfg, jax.random.PRNGKey(0))
        cfg_moe, params_moe = upcycle(cfg, params, moe_mode="sparse",
                                      num_experts=4, top_k=2)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
        outs = {}
        for mode in ("gather", "einsum"):
            c = cfg_moe.replace(moe_dispatch=mode)
            outs[mode] = decoder.forward(params_moe, c, input_ids=ids,
                                         train=True)
        np.testing.assert_allclose(np.asarray(outs["gather"].hidden),
                                   np.asarray(outs["einsum"].hidden),
                                   atol=1e-5)
        assert float(outs["gather"].aux_loss) == pytest.approx(
            float(outs["einsum"].aux_loss), rel=1e-6)


class TestRaggedDispatch:
    """moe_ffn_ragged(+_grouped) == the gather path: identical drops and
    combine weights, experts computed over only the kept rows."""

    def _setup(self, s=64, e=4, d=16, k=2, seed=0):
        from llavamod_tpu.ops.moe import GatingConfig

        rng = np.random.default_rng(seed)
        cfg = GatingConfig(num_experts=e, top_k=k, capacity_factor=1.2,
                           min_capacity=4)
        logits = jnp.asarray(rng.normal(size=(s, e)), jnp.float32) * 2
        x = jnp.asarray(rng.normal(size=(s, d)), jnp.float32)
        tv = jnp.asarray(rng.random(s) > 0.1)
        w_up = jnp.asarray(rng.normal(size=(e, d, 32)) * 0.2, jnp.float32)
        w_dn = jnp.asarray(rng.normal(size=(e, 32, d)) * 0.2, jnp.float32)

        def expert_fn(xe):
            h = jax.nn.gelu(jnp.einsum("ecd,edf->ecf", xe, w_up))
            return jnp.einsum("ecf,efd->ecd", h, w_dn)

        def expert_fn_ragged(xr, gsz):
            h = jax.nn.gelu(jax.lax.ragged_dot(xr, w_up, gsz))
            return jax.lax.ragged_dot(h, w_dn, gsz)

        return cfg, logits, x, tv, expert_fn, expert_fn_ragged

    @pytest.mark.parametrize("top_k", [1, 2])
    def test_matches_gather_path(self, top_k):
        import dataclasses

        from llavamod_tpu.ops.moe import (moe_ffn_gather, moe_ffn_ragged,
                                          top_k_gating_compact)

        cfg, logits, x, tv, expert_fn, expert_fn_ragged = self._setup(k=top_k)
        cfg = dataclasses.replace(cfg, top_k=top_k)
        cap = cfg.capacity(x.shape[0], True)

        def f_gat(x, logits):
            c = top_k_gating_compact(logits, cfg, train=True, token_valid=tv)
            return jnp.sum(moe_ffn_gather(x, c, cfg.num_experts, cap,
                                          expert_fn))

        def f_rag(x, logits):
            c = top_k_gating_compact(logits, cfg, train=True, token_valid=tv)
            return jnp.sum(moe_ffn_ragged(x, c, cfg.num_experts, cap,
                                          expert_fn_ragged))

        y0, g0 = jax.value_and_grad(f_gat, argnums=(0, 1))(x, logits)
        y1, g1 = jax.value_and_grad(f_rag, argnums=(0, 1))(x, logits)
        assert float(y0) == pytest.approx(float(y1), rel=1e-5)
        np.testing.assert_allclose(np.asarray(g0[0]), np.asarray(g1[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                                   atol=1e-5)

    def test_capacity_drops_match(self):
        # force heavy drops: tiny deterministic capacity
        import dataclasses

        from llavamod_tpu.ops.moe import (moe_ffn_gather, moe_ffn_ragged,
                                          top_k_gating_compact)

        cfg, logits, x, tv, expert_fn, expert_fn_ragged = self._setup()
        cfg = dataclasses.replace(cfg, deterministic_capacity=5)
        c = top_k_gating_compact(logits, cfg, train=True, token_valid=tv)
        assert not bool(np.asarray(c.kept).all())  # drops actually happen
        y_g = moe_ffn_gather(x, c, cfg.num_experts, 5, expert_fn)
        y_r = moe_ffn_ragged(x, c, cfg.num_experts, 5, expert_fn_ragged)
        np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_r),
                                   atol=1e-6)

    def test_grouped_matches_gather_grouped(self):
        from llavamod_tpu.ops.moe import (moe_ffn_gather_grouped,
                                          moe_ffn_ragged_grouped,
                                          top_k_gating_compact)

        cfg, logits, x, tv, expert_fn, expert_fn_ragged = self._setup()
        g, grp, e = 2, 32, cfg.num_experts
        lg = logits.reshape(g, grp, e)
        tvg = tv.reshape(g, grp)
        comp = jax.vmap(lambda l, v: top_k_gating_compact(
            l, cfg, train=True, token_valid=v))(lg, tvg)
        cap = cfg.capacity(grp, True)
        y_g = moe_ffn_gather_grouped(x, comp, e, cap, grp, expert_fn)
        y_r = moe_ffn_ragged_grouped(x, comp, e, cap, grp, expert_fn_ragged)
        np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_r),
                                   atol=1e-6)

    def test_decoder_ragged_equals_gather(self):
        from llavamod_tpu.models.llm import decoder
        from llavamod_tpu.models.llm.config import tiny_config
        from llavamod_tpu.models.llm.upcycle import upcycle

        cfg = tiny_config(num_layers=2, hidden_size=32, intermediate_size=64,
                          vocab_size=128)
        params = decoder.init(cfg, jax.random.PRNGKey(0))
        cfg_moe, params_moe = upcycle(cfg, params, moe_mode="sparse",
                                      num_experts=4, top_k=2)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
        outs = {}
        for mode in ("gather", "ragged"):
            c = cfg_moe.replace(moe_dispatch=mode)
            outs[mode] = decoder.forward(params_moe, c, input_ids=ids,
                                         train=True)
        np.testing.assert_allclose(np.asarray(outs["gather"].hidden),
                                   np.asarray(outs["ragged"].hidden),
                                   atol=1e-5)
        assert float(outs["gather"].aux_loss) == pytest.approx(
            float(outs["ragged"].aux_loss), rel=1e-6)

    def test_decoder_ragged_grouped_int8_experts(self):
        # grouped gating + int8 expert weights through the ragged path
        from llavamod_tpu.models.llm import decoder
        from llavamod_tpu.models.llm.config import tiny_config
        from llavamod_tpu.models.llm.upcycle import upcycle

        cfg = tiny_config(num_layers=2, hidden_size=32, intermediate_size=64,
                          vocab_size=128)
        params = decoder.init(cfg, jax.random.PRNGKey(0))
        cfg_moe, params_moe = upcycle(cfg, params, moe_mode="sparse",
                                      num_experts=4, top_k=2)
        params_q = jax.tree_util.tree_map(lambda x: x, params_moe)  # copy refs
        for layer in params_q["layers"]:
            if "experts" in layer.get("mlp", {}):
                layer["mlp"] = dict(layer["mlp"])
                layer["mlp"]["experts"] = decoder.quantize_experts_int8(
                    layer["mlp"]["experts"])
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
        outs = {}
        for mode in ("gather", "ragged"):
            c = cfg_moe.replace(moe_dispatch=mode, moe_gating_group_size=8)
            outs[mode] = decoder.forward(params_q, c, input_ids=ids,
                                         train=True)
        np.testing.assert_allclose(np.asarray(outs["gather"].hidden),
                                   np.asarray(outs["ragged"].hidden),
                                   atol=2e-2, rtol=1e-2)
