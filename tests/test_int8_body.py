"""int8-W8A8 STUDENT BODY under training: straight-through backward.

The int8 matmul dicts were forward-only (frozen teacher inference) until the
router-only flagship recipe made the quantized-body student a TRAINING
configuration: every non-router weight is frozen int8, but the router's
gradient needs dL/dx through every quantized matmul.  decoder.dense_int8 /
expert_dense_int8 / ragged_dense_int8 are custom_vjps whose backward is the
straight-through estimate dL/dx = g @ W_deq^T executed as a second W8A8
matmul (g rows dynamically quantized like forward activations — the same
estimate ops/losses.py uses for the int8 student LM head).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llavamod_tpu.models.llm import decoder

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


class TestSTEVjps:
    """Each int8 matmul's dL/dx matches the exact dequantized-weight
    backward up to the int8 quantization of the cotangent rows (~<2%)."""

    def test_dense_int8_dx(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(6, 32)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(32, 48)) * 0.3, jnp.float32)
        q = decoder.quantize_dense_int8(w)
        w_deq = np.asarray(q["w_int8"], np.float32) * np.asarray(q["scale"])

        g = jnp.asarray(rng.normal(size=(6, 48)), jnp.float32)
        _, vjp = jax.vjp(lambda x_: decoder.dense(x_, q), x)
        (dx,) = vjp(g)
        dx_exact = np.asarray(g) @ w_deq.T
        assert _rel_err(dx, dx_exact) < 0.02

    def test_dense_int8_grad_not_zero_via_round(self):
        # without the custom_vjp, jnp.round's zero grad would make this ~0
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        q = decoder.quantize_dense_int8(
            jnp.asarray(rng.normal(size=(16, 16)) * 0.3, jnp.float32))
        dx = jax.grad(lambda x_: jnp.sum(decoder.dense(x_, q) ** 2))(x)
        assert float(jnp.max(jnp.abs(dx))) > 1e-3

    def test_expert_dense_int8_dx(self):
        rng = np.random.default_rng(2)
        e, c, d, f = 3, 8, 16, 24
        xe = jnp.asarray(rng.normal(size=(e, c, d)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(e, d, f)) * 0.3, jnp.float32)
        q = decoder.quantize_experts_int8({"up": w})["up"]
        w_deq = (np.asarray(q["w_int8"], np.float32)
                 * np.asarray(q["scale"])[:, None, :])

        g = jnp.asarray(rng.normal(size=(e, c, f)), jnp.float32)
        _, vjp = jax.vjp(lambda x_: decoder._expert_dense(x_, q), xe)
        (dx,) = vjp(g)
        dx_exact = np.einsum("ecf,edf->ecd", np.asarray(g), w_deq)
        assert _rel_err(dx, dx_exact) < 0.02

    def test_ragged_dense_int8_dx(self):
        rng = np.random.default_rng(3)
        e, d, f, m = 3, 16, 24, 20
        xr = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(e, d, f)) * 0.3, jnp.float32)
        q = decoder.quantize_experts_int8({"up": w})["up"]
        gs = jnp.asarray([8, 7, 5], jnp.int32)
        w_deq = (np.asarray(q["w_int8"], np.float32)
                 * np.asarray(q["scale"])[:, None, :])

        g = jnp.asarray(rng.normal(size=(m, f)), jnp.float32)
        _, vjp = jax.vjp(
            lambda x_: decoder._ragged_dense(x_, q, gs), xr)
        (dx,) = vjp(g)
        row_expert = np.repeat(np.arange(e), np.asarray(gs))
        dx_exact = np.einsum("mf,mdf->md", np.asarray(g), w_deq[row_expert])
        assert _rel_err(dx, dx_exact) < 0.02

    def test_forward_values_unchanged_by_vjp_wrapper(self):
        # the custom_vjp primal is the same impl the inference path always
        # ran — spot-check against a hand-rolled W8A8 reference
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(5, 32)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(32, 40)) * 0.3, jnp.float32)
        q = decoder.quantize_dense_int8(w)
        y = decoder.dense(x, q)

        s_x = np.maximum(
            np.max(np.abs(np.asarray(x)), -1, keepdims=True) / 127.0, 1e-8)
        xq = np.clip(np.round(np.asarray(x) / s_x), -127, 127)
        y_ref = (xq @ np.asarray(q["w_int8"], np.float32)) * s_x \
            * np.asarray(q["scale"])
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4)


class TestQuantizedBodyTraining:
    """End-to-end: a fully int8 frozen body (attention + dense MLP + experts)
    still feeds useful gradients to the float router."""

    def _tiny_moe(self, seed=0):
        """Tiny upcycled MoE with PERTURBED experts + a random router:
        upcycle()'s exact expert replicas make the router's hidden-path
        gradient mathematically zero (identical expert outputs x renormalized
        combine weights summing to 1), which would vacuously pass any
        grads-flow test here."""
        from llavamod_tpu.models.llm.config import tiny_config
        from llavamod_tpu.models.llm.upcycle import upcycle

        cfg = tiny_config(num_layers=2, hidden_size=32, intermediate_size=64,
                          vocab_size=128)
        params = decoder.init(cfg, jax.random.PRNGKey(seed))
        cfg_moe, params_moe = upcycle(cfg, params, moe_mode="sparse",
                                      num_experts=4, top_k=2)
        key = jax.random.PRNGKey(seed + 100)
        for layer in params_moe["layers"]:
            mlp = layer.get("mlp", {})
            if "experts" in mlp:
                for name, w in mlp["experts"].items():
                    key, k1 = jax.random.split(key)
                    mlp["experts"][name] = w + 0.3 * jax.random.normal(
                        k1, w.shape, w.dtype) * jnp.std(w)
                key, k2 = jax.random.split(key)
                mlp["router"] = 0.5 * jax.random.normal(
                    k2, mlp["router"].shape, mlp["router"].dtype)
        return cfg_moe, params_moe

    @staticmethod
    def _router_grads(cfg, params, ids):
        def loss(router_trees, frozen):
            full = jax.tree_util.tree_map(lambda x: x, frozen)
            for i, r in enumerate(router_trees):
                full["layers"][i] = dict(full["layers"][i])
                full["layers"][i]["mlp"] = dict(full["layers"][i]["mlp"])
                full["layers"][i]["mlp"]["router"] = r
            out = decoder.forward(full, cfg, input_ids=ids, train=True)
            # no aux term: the aux loss depends on the router DIRECTLY and
            # identically in float/int8 models — including it would let a
            # broken hidden path pass both the nonzero and cosine checks
            return jnp.sum(out.hidden.astype(jnp.float32) ** 2)

        routers = [layer["mlp"]["router"] for layer in params["layers"]
                   if "router" in layer.get("mlp", {})]
        frozen = params
        return jax.grad(loss)(routers, frozen)

    def test_router_grad_direction_matches_float_body(self):
        cfg, params = self._tiny_moe()
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
        params_q = dict(params)
        params_q["layers"] = decoder.quantize_decoder_int8(
            params, include_experts=True)["layers"]

        g_f = self._router_grads(cfg, params, ids)
        g_q = self._router_grads(cfg, params_q, ids)
        for gf, gq in zip(g_f, g_q):
            gf, gq = np.asarray(gf, np.float64), np.asarray(gq, np.float64)
            assert np.isfinite(gq).all()
            assert np.linalg.norm(gq) > 1e-6
            cos = (gf * gq).sum() / (np.linalg.norm(gf)
                                     * np.linalg.norm(gq) + 1e-12)
            # int8 changes the FORWARD (activations shift, borderline
            # routing decisions can flip) so the two are grads of genuinely
            # different networks — same-direction, not equality, is the bar;
            # the backward itself is pinned exactly by TestSTEVjps
            assert cos > 0.7, cos
            ratio = np.linalg.norm(gq) / (np.linalg.norm(gf) + 1e-12)
            assert 0.3 < ratio < 3.0, ratio

    @pytest.mark.parametrize("dispatch", ["gather", "ragged"])
    def test_router_grads_flow_every_dispatch(self, dispatch):
        cfg, params = self._tiny_moe()
        cfg = cfg.replace(moe_dispatch=dispatch, moe_gating_group_size=8)
        params_q = dict(params)
        params_q["layers"] = decoder.quantize_decoder_int8(
            params, include_experts=True)["layers"]
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 128)
        for g in self._router_grads(cfg, params_q, ids):
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.max(jnp.abs(g))) > 1e-6

    def test_router_only_training_converges_with_int8_body(self):
        """Router-only adam on one repeated batch must cut the loss — the
        STE gradients through the fully quantized body actually learn
        (the bench flagship_fit recipe in miniature)."""
        import optax

        cfg, params = self._tiny_moe()
        params_q = dict(params)
        params_q["layers"] = decoder.quantize_decoder_int8(
            params, include_experts=True)["layers"]
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 128)
        tgt = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 32))

        routers = [layer["mlp"]["router"]
                   for layer in params_q["layers"] if "router" in layer["mlp"]]

        def loss_fn(routers):
            full = jax.tree_util.tree_map(lambda x: x, params_q)
            ri = 0
            for i, layer in enumerate(full["layers"]):
                if "router" in layer["mlp"]:
                    full["layers"][i] = dict(layer)
                    full["layers"][i]["mlp"] = dict(layer["mlp"])
                    full["layers"][i]["mlp"]["router"] = routers[ri]
                    ri += 1
            out = decoder.forward(full, cfg, input_ids=ids, train=True)
            return jnp.mean((out.hidden.astype(jnp.float32) - tgt) ** 2)

        opt = optax.adam(3e-2)
        opt_state = opt.init(routers)

        @jax.jit
        def step(routers, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(routers)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(routers, updates), opt_state, loss

        first = None
        for _ in range(40):
            routers, opt_state, loss = step(routers, opt_state)
            if first is None:
                first = float(loss)
        last = float(loss)
        assert np.isfinite(last)
        assert last < 0.97 * first, (first, last)


class TestFusedInt8Layout:
    """quantize_decoder_int8(fuse=True) — the default — concatenates
    projections sharing an input into one wide int8 matmul (wq|wk|wv ->
    'wqkv', gate|up -> 'gate_up').  The forward is BIT-identical to the
    unfused layout: the shared input is quantized once with the same
    per-row scales either way, weight scales are per-output-channel (they
    concatenate exactly), and the int32 MXU accumulation is exact."""

    def _cfg_params(self):
        from llavamod_tpu.models.llm.config import tiny_config

        cfg = tiny_config(num_layers=2, num_heads=4, num_kv_heads=2,
                          hidden_size=32, intermediate_size=64,
                          vocab_size=128, qkv_bias=True)
        return cfg, decoder.init(cfg, jax.random.PRNGKey(7))

    def test_fused_forward_bit_identical_to_unfused(self):
        cfg, params = self._cfg_params()
        qf = decoder.quantize_decoder_int8(params, fuse=True)
        qu = decoder.quantize_decoder_int8(params, fuse=False)
        attn = qf["layers"][0]["attn"]
        assert "wqkv" in attn and "wq" not in attn
        assert "gate_up" in qf["layers"][0]["mlp"]
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                                 cfg.vocab_size)
        h_f = decoder.forward(qf, cfg, input_ids=ids, train=True).hidden
        h_u = decoder.forward(qu, cfg, input_ids=ids, train=True).hidden
        np.testing.assert_array_equal(np.asarray(h_f), np.asarray(h_u))

    def test_fused_ste_grads_flow_upstream(self):
        """dL/dx through the fused wqkv/gate_up matmuls reaches a float
        param upstream of the whole quantized stack (the embedding),
        matching the unfused STE direction."""
        cfg, params = self._cfg_params()

        def emb_grad(q):
            def loss(emb):
                full = dict(q)
                full["embed"] = {"embedding": emb}
                ids = jnp.arange(8, dtype=jnp.int32).reshape(1, 8) + 3
                out = decoder.forward(full, cfg, input_ids=ids, train=True)
                return jnp.sum(out.hidden.astype(jnp.float32) ** 2)

            return jax.grad(loss)(params["embed"]["embedding"])

        g_f = np.asarray(emb_grad(decoder.quantize_decoder_int8(
            params, fuse=True)), np.float64)
        g_u = np.asarray(emb_grad(decoder.quantize_decoder_int8(
            params, fuse=False)), np.float64)
        assert np.isfinite(g_f).all() and np.linalg.norm(g_f) > 1e-6
        cos = (g_f * g_u).sum() / (np.linalg.norm(g_f)
                                   * np.linalg.norm(g_u) + 1e-12)
        # backward cotangent quantization granularity differs (one shared
        # row scale across the fused width vs one per projection) — the
        # STE estimates agree in direction, not bit-for-bit
        assert cos > 0.99, cos

    def test_requantize_is_idempotent(self):
        """Re-calling quantize_decoder_int8 on an already-quantized tree
        (fused or unfused) must be a no-op, not a KeyError: the fuse guard
        treats MISSING wq/wk/wv as already handled (advisor round-4
        finding), and int8 dict leaves are skipped."""
        cfg, params = self._cfg_params()
        for fuse_first in (True, False):
            q1 = decoder.quantize_decoder_int8(params, fuse=fuse_first)
            q2 = decoder.quantize_decoder_int8(q1, fuse=True)  # re-call
            ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0,
                                     cfg.vocab_size)
            h1 = decoder.forward(q1, cfg, input_ids=ids, train=True).hidden
            h2 = decoder.forward(q2, cfg, input_ids=ids, train=True).hidden
            np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
