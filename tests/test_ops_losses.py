"""Golden-value and gradient tests for the chunked loss ops.

Reference semantics are re-derived with dense jnp math (softmax over the full
vocab) — the chunked implementations must match to fp32 tolerance, including
gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llavamod_tpu.ops.losses import (

    chunked_kd_cross_entropy,
    chunked_lse_and_gather,
    dpo_loss,
    kd_align_loss,
    sequence_log_prob,
    softmax_cross_entropy,
)

pytestmark = pytest.mark.slow  # compile-heavy numerics; -m "not slow" skips

KEY = jax.random.PRNGKey(0)


def _rand(*shape, key=KEY, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


def dense_ce(hidden, w, labels, shift=True, ignore=-100, vocab_limit=None):
    if shift:
        hidden, labels = hidden[:, :-1], labels[:, 1:]
    logits = jnp.einsum("btd,vd->btv", hidden, w).astype(jnp.float32)
    if vocab_limit:
        logits = logits[..., :vocab_limit]
    logp = jax.nn.log_softmax(logits, axis=-1)
    mask = labels != ignore
    safe = jnp.where(mask, labels, 0)
    picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return -(picked * mask).sum() / jnp.maximum(mask.sum(), 1)


def test_chunked_lse_and_gather_matches_dense():
    n, d, v = 12, 16, 50
    h = _rand(n, d)
    w = _rand(v, d, key=jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, 40)
    lse, picked = chunked_lse_and_gather(h, w, ids, 40, chunk=16)
    logits = (h @ w[:40].T).astype(jnp.float32)
    np.testing.assert_allclose(lse, jax.scipy.special.logsumexp(logits, axis=-1),
                               rtol=1e-5)
    np.testing.assert_allclose(
        picked, jnp.take_along_axis(logits, ids[:, None], 1)[:, 0], rtol=1e-5)


def test_chunked_lse_gather_grads():
    n, d, v = 6, 8, 30
    h = _rand(n, d)
    w = _rand(v, d, key=jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(2), (n,), 0, v)

    def f_chunked(h, w):
        lse, picked = chunked_lse_and_gather(h, w, ids, v, chunk=8)
        return jnp.sum(lse * 0.7 - picked * 1.3)

    def f_dense(h, w):
        logits = (h @ w.T).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, ids[:, None], 1)[:, 0]
        return jnp.sum(lse * 0.7 - picked * 1.3)

    g1 = jax.grad(f_chunked, argnums=(0, 1))(h, w)
    g2 = jax.grad(f_dense, argnums=(0, 1))(h, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_softmax_cross_entropy_matches_dense():
    b, t, d, v = 2, 10, 16, 64
    h = _rand(b, t, d)
    w = _rand(v, d, key=jax.random.PRNGKey(3))
    labels = jax.random.randint(jax.random.PRNGKey(4), (b, t), 0, v)
    labels = labels.at[:, :3].set(-100)
    out = softmax_cross_entropy(h, w, labels, chunk=16)
    np.testing.assert_allclose(out.loss, dense_ce(h, w, labels), rtol=1e-5)


def test_kd_align_loss_matches_dense_reference():
    """Reference math (align_trainer.py:503-528): -sum p_t logp_s, no shift,
    token-mean over labels != -100; vocab sliced to shared prefix."""
    b, t, ds, dt, vs, vt = 2, 6, 8, 12, 40, 48
    h_s = _rand(b, t, ds)
    h_t = _rand(b, t, dt, key=jax.random.PRNGKey(5))
    w_s = _rand(vs, ds, key=jax.random.PRNGKey(6))
    w_t = _rand(vt, dt, key=jax.random.PRNGKey(7))
    labels = jax.random.randint(jax.random.PRNGKey(8), (b, t), 0, vs)
    labels = labels.at[0, :2].set(-100)

    out = kd_align_loss(h_s, w_s, h_t, w_t, labels, chunk=16)

    v = vs  # min(vs, vt)
    s = jnp.einsum("btd,vd->btv", h_s, w_s).astype(jnp.float32)[..., :v]
    tl = jnp.einsum("btd,vd->btv", h_t, w_t).astype(jnp.float32)[..., :v]
    p_t = jax.nn.softmax(tl, axis=-1)
    logp_s = jax.nn.log_softmax(s, axis=-1)
    x = jnp.sum(p_t * logp_s, axis=-1)
    mask = (labels != -100).astype(jnp.float32)
    expected = -jnp.sum(x * mask) / jnp.sum(mask)
    np.testing.assert_allclose(out.loss, expected, rtol=1e-5)


def test_kd_loss_grad_is_ps_minus_pt():
    b, t, d, v = 1, 4, 8, 24
    h_s = _rand(b, t, d)
    h_t = _rand(b, t, d, key=jax.random.PRNGKey(9))
    w = _rand(v, d, key=jax.random.PRNGKey(10))
    labels = jnp.zeros((b, t), jnp.int32)

    def f_chunked(h_s):
        return kd_align_loss(h_s, w, h_t, w, labels, chunk=8).loss

    def f_dense(h_s):
        s = jnp.einsum("btd,vd->btv", h_s, w).astype(jnp.float32)
        tl = jnp.einsum("btd,vd->btv", h_t, w).astype(jnp.float32)
        x = jnp.sum(jax.nn.softmax(tl, -1) * jax.nn.log_softmax(s, -1), -1)
        return -jnp.mean(x)

    np.testing.assert_allclose(jax.grad(f_chunked)(h_s), jax.grad(f_dense)(h_s),
                               rtol=1e-3, atol=1e-5)


def test_kd_loss_distill_all_tokens():
    b, t, d, v = 1, 4, 8, 16
    h = _rand(b, t, d)
    labels = jnp.full((b, t), -100)
    w = _rand(v, d, key=jax.random.PRNGKey(11))
    out = kd_align_loss(h, w, h, w, labels, distill_all_tokens=True, chunk=8)
    # teacher == student => KL cross term = entropy; loss = H(p) > 0, finite
    assert np.isfinite(float(out.loss))
    assert float(out.num_tokens) == b * t


def test_sequence_log_prob_matches_dense():
    b, t, d, v = 2, 8, 8, 32
    h = _rand(b, t, d)
    w = _rand(v, d, key=jax.random.PRNGKey(12))
    labels = jax.random.randint(jax.random.PRNGKey(13), (b, t), 0, v)
    labels = labels.at[:, :4].set(-100)

    got = sequence_log_prob(h, w, labels, chunk=8)

    logits = jnp.einsum("btd,vd->btv", h[:, :-1], w).astype(jnp.float32)
    lab = labels[:, 1:]
    mask = lab != -100
    logp = jax.nn.log_softmax(logits, -1)
    picked = jnp.take_along_axis(logp, jnp.where(mask, lab, 0)[..., None], -1)[..., 0]
    expected = (picked * mask).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


@pytest.mark.parametrize("loss_type", ["sigmoid", "hinge", "ipo", "kto_pair"])
def test_dpo_loss_types(loss_type):
    pc = jnp.array([-10.0, -12.0])
    pr = jnp.array([-15.0, -11.0])
    rc = jnp.array([-11.0, -12.5])
    rr = jnp.array([-14.0, -11.5])
    out = dpo_loss(pc, pr, rc, rr, beta=0.1, loss_type=loss_type)
    expected_len = 4 if loss_type == "kto_pair" else 2
    assert out.losses.shape == (expected_len,)
    assert np.all(np.isfinite(out.losses))
    np.testing.assert_allclose(out.chosen_rewards, 0.1 * (pc - rc), rtol=1e-6)


def test_dpo_sigmoid_golden():
    # hand-computed: logits = (pc-pr)-(rc-rr) = (5-(-1)) ... single sample
    pc, pr, rc, rr = map(jnp.atleast_1d, (-10.0, -15.0, -11.0, -14.0))
    out = dpo_loss(pc, pr, rc, rr, beta=0.1, loss_type="sigmoid")
    logits = (pc - pr) - (rc - rr)  # 5 - 3 = 2
    expected = -jax.nn.log_sigmoid(0.1 * logits)
    np.testing.assert_allclose(out.losses, expected, rtol=1e-6)


def test_fused_kd_ce_matches_separate_losses():
    """chunked_kd_ce == (kd_align_loss, shifted softmax_cross_entropy) in
    values AND gradients (it shares one streaming pass)."""
    from llavamod_tpu.ops.losses import (
        kd_align_loss,
        kd_ce_align_loss,
        softmax_cross_entropy,
    )

    rng = np.random.default_rng(0)
    b, t, ds, dt, v = 2, 16, 24, 32, 97
    h_s = jnp.asarray(rng.normal(size=(b, t, ds)), jnp.float32)
    h_t = jnp.asarray(rng.normal(size=(b, t, dt)), jnp.float32)
    w_s = jnp.asarray(rng.normal(size=(v + 5, ds)) * 0.3, jnp.float32)
    w_t = jnp.asarray(rng.normal(size=(v + 9, dt)) * 0.3, jnp.float32)
    labels = rng.integers(0, v, size=(b, t)).astype(np.int32)
    labels[:, :4] = -100
    labels[0, 9] = -100
    labels = jnp.asarray(labels)

    def fused(h_s, w_s):
        out = kd_ce_align_loss(h_s, w_s, h_t, w_t, labels, vocab_limit=v,
                               chunk=32)
        return out.kd_loss + out.ce_loss, (out.kd_loss, out.ce_loss)

    def separate(h_s, w_s):
        kd = kd_align_loss(h_s, w_s, h_t, w_t, labels, vocab_limit=v, chunk=32)
        ce = softmax_cross_entropy(h_s, w_s, labels, vocab_limit=v, chunk=32)
        return kd.loss + ce.loss, (kd.loss, ce.loss)

    (tot_f, (kd_f, ce_f)), g_f = jax.value_and_grad(
        fused, argnums=(0, 1), has_aux=True)(h_s, w_s)
    (tot_s, (kd_s, ce_s)), g_s = jax.value_and_grad(
        separate, argnums=(0, 1), has_aux=True)(h_s, w_s)

    assert float(kd_f) == pytest.approx(float(kd_s), rel=1e-5)
    assert float(ce_f) == pytest.approx(float(ce_s), rel=1e-5)
    for a, b_ in zip(g_f, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_fused_kd_ce_distill_all_tokens():
    from llavamod_tpu.ops.losses import kd_align_loss, kd_ce_align_loss

    rng = np.random.default_rng(1)
    b, t, d, v = 1, 8, 16, 50
    h_s = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    h_t = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(v, d)) * 0.3, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(b, t)), jnp.int32)
    out = kd_ce_align_loss(h_s, w, h_t, w, labels, vocab_limit=v,
                           distill_all_tokens=True, chunk=16)
    ref = kd_align_loss(h_s, w, h_t, w, labels, vocab_limit=v,
                        distill_all_tokens=True, chunk=16)
    assert float(out.kd_loss) == pytest.approx(float(ref.loss), rel=1e-5)
    assert float(out.kd_tokens) == b * t


def test_int8_head_kd_and_lse_paths():
    """int8-quantized teacher/ref LM head (decoder.quantize_head_int8 dict):
    losses stay within ~1e-3 of the float head, student grads unaffected on
    the CE side, teacher-side grad contribution within ~2% relative."""
    from llavamod_tpu.models.llm.decoder import quantize_head_int8
    from llavamod_tpu.ops.losses import chunked_kd_ce

    rng = np.random.default_rng(0)
    n, d_s, d_t, v = 64, 32, 48, 1000
    h_s = jnp.asarray(rng.normal(size=(n, d_s)), jnp.float32)
    w_s = jnp.asarray(rng.normal(size=(v, d_s)) * 0.3, jnp.float32)
    h_t = jnp.asarray(rng.normal(size=(n, d_t)), jnp.float32)
    w_t = jnp.asarray(rng.normal(size=(v, d_t)) * 0.3, jnp.float32)
    weight = jnp.ones((n,), jnp.float32) / n
    ids = jnp.asarray(rng.integers(0, 900, n), jnp.int32)
    wq = quantize_head_int8(w_t)
    assert wq["w_int8"].dtype == jnp.int8 and wq["scale"].shape == (v,)

    f = lambda hs, wt: chunked_kd_cross_entropy(  # noqa: E731
        hs, w_s, h_t, wt, weight, 950, 256)
    l0, g0 = jax.value_and_grad(f)(h_s, w_t)
    l1, g1 = jax.value_and_grad(f)(h_s, wq)
    assert abs(float(l1 - l0)) / abs(float(l0)) < 1e-3
    assert float(jnp.linalg.norm(g1 - g0) / jnp.linalg.norm(g0)) < 2e-2

    kd0, ce0 = chunked_kd_ce(h_s, w_s, h_t, w_t, weight, weight, ids, 950, 256)
    kd1, ce1 = chunked_kd_ce(h_s, w_s, h_t, wq, weight, weight, ids, 950, 256)
    assert abs(float(kd1 - kd0)) / abs(float(kd0)) < 1e-3
    assert float(ce1) == float(ce0)  # student-side CE is untouched

    # ref-model path: lse/gather over an int8 head, incl. dh backward
    g = lambda h, wt: jnp.sum(jnp.stack(  # noqa: E731
        chunked_lse_and_gather(h, wt, ids, 950, 256)))
    a0, d0 = jax.value_and_grad(g)(h_t, w_t)
    a1, d1 = jax.value_and_grad(g)(h_t, wq)
    assert abs(float(a1 - a0)) / abs(float(a0)) < 1e-3
    assert float(jnp.linalg.norm(d1 - d0) / jnp.linalg.norm(d0)) < 2e-2


def test_int8_head_logits_from_hidden():
    """decoder.logits_from_hidden consumes the int8 head dict (serving path)."""
    from llavamod_tpu.models.llm import decoder
    from llavamod_tpu.models.llm.config import tiny_config

    cfg = tiny_config(num_layers=1, hidden_size=32, intermediate_size=64,
                      vocab_size=256)
    params = decoder.init(cfg, jax.random.PRNGKey(0))
    hidden = _rand(2, 5, 32)
    ref = decoder.logits_from_hidden(params, cfg, hidden)
    qparams = decoder.quantize_decoder_int8(params, include_lm_head=True)
    got = decoder.logits_from_hidden(qparams, cfg, hidden)
    assert got.shape == ref.shape
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err < 0.05 * max(scale, 1.0)


def test_int8_student_head_in_fused_kd_ce():
    """int8 STUDENT head (frozen-head recipes): loss within ~1e-3 of the
    float head; dh cotangent flows; dw cotangent is None (head frozen)."""
    from llavamod_tpu.models.llm.decoder import quantize_head_int8
    from llavamod_tpu.ops.losses import chunked_kd_ce

    rng = np.random.default_rng(1)
    n, d_s, d_t, v = 64, 32, 48, 1000
    h_s = jnp.asarray(rng.normal(size=(n, d_s)), jnp.float32)
    w_s = jnp.asarray(rng.normal(size=(v, d_s)) * 0.3, jnp.float32)
    h_t = jnp.asarray(rng.normal(size=(n, d_t)), jnp.float32)
    wtq = quantize_head_int8(
        jnp.asarray(rng.normal(size=(v, d_t)) * 0.3, jnp.float32))
    weight = jnp.ones((n,), jnp.float32) / n
    ids = jnp.asarray(rng.integers(0, 900, n), jnp.int32)
    wsq = quantize_head_int8(w_s)

    def f(hs, ws):
        kd, ce = chunked_kd_ce(hs, ws, h_t, wtq, weight, weight, ids, 950, 256)
        return kd + ce

    l0, g0 = jax.value_and_grad(f)(h_s, w_s)
    l1, g1 = jax.value_and_grad(f)(h_s, wsq)
    assert abs(float(l1 - l0)) / abs(float(l0)) < 1e-3
    assert float(jnp.linalg.norm(g1 - g0) / jnp.linalg.norm(g0)) < 2e-2
    assert np.all(np.isfinite(np.asarray(g1)))


def test_int8_dh_cotangent_estimate_direction():
    """kd losses with int8_dh=True (TrainConfig.kd_int8_dh): dL/dhidden runs
    through the int8 student head with dynamically quantized cotangent rows
    (the int8-body STE scheme).  Loss value is IDENTICAL (forward unchanged);
    the dh estimate must track the exact dequantized-bf16 path in direction
    and norm."""
    from llavamod_tpu.models.llm.decoder import quantize_head_int8
    from llavamod_tpu.ops.losses import (
        chunked_kd_ce,
        chunked_kd_cross_entropy,
    )

    rng = np.random.default_rng(3)
    n, d_s, d_t, v = 64, 32, 48, 1000
    h_s = jnp.asarray(rng.normal(size=(n, d_s)), jnp.float32)
    w_s = quantize_head_int8(
        jnp.asarray(rng.normal(size=(v, d_s)) * 0.3, jnp.float32))
    h_t = jnp.asarray(rng.normal(size=(n, d_t)), jnp.float32)
    w_t = jnp.asarray(rng.normal(size=(v, d_t)) * 0.3, jnp.float32)
    weight = jnp.ones((n,), jnp.float32) / n
    ids = jnp.asarray(rng.integers(0, 900, n), jnp.int32)

    def cos_and_rel(g_exact, g_est):
        ge, gs = np.asarray(g_exact, np.float64), np.asarray(g_est, np.float64)
        cos = (ge * gs).sum() / (np.linalg.norm(ge) * np.linalg.norm(gs) + 1e-12)
        rel = np.linalg.norm(gs - ge) / (np.linalg.norm(ge) + 1e-12)
        return cos, rel

    for int8_dh in (False, True):
        f = lambda hs: chunked_kd_cross_entropy(  # noqa: E731
            hs, w_s, h_t, w_t, weight, 950, 256, int8_dh)
        l, g = jax.value_and_grad(f)(h_s)
        if not int8_dh:
            l0, g0 = l, g
    assert float(l) == float(l0)  # forward identical
    cos, rel = cos_and_rel(g0, g)
    assert cos > 0.999 and rel < 0.05, (cos, rel)

    kd0, _ = chunked_kd_ce(h_s, w_s, h_t, w_t, weight, weight, ids, 950, 256,
                           False)
    f2 = lambda hs, flag: chunked_kd_ce(  # noqa: E731
        hs, w_s, h_t, w_t, weight, weight, ids, 950, 256, flag)[0]
    _, gg0 = jax.value_and_grad(f2)(h_s, False)
    kd1v, gg1 = jax.value_and_grad(f2)(h_s, True)
    assert float(kd1v) == float(kd0)
    cos, rel = cos_and_rel(gg0, gg1)
    assert cos > 0.999 and rel < 0.05, (cos, rel)


@pytest.mark.parametrize("stream_dh", [False, True])
def test_streamed_dh_matches_dense_reference(stream_dh):
    """int8-student-head KD/KD+CE backward (the streamed-dh path: dh built
    from the forward's p@W accumulators, no head repass) vs a dense
    brute-force gradient over the dequantized head."""
    from llavamod_tpu.models.llm.decoder import quantize_head_int8
    from llavamod_tpu.ops.losses import (
        chunked_kd_ce,
        chunked_kd_cross_entropy,
    )

    rng = np.random.default_rng(11)
    n, d_s, d_t, v, vl = 48, 24, 40, 512, 500
    h_s = jnp.asarray(rng.normal(size=(n, d_s)), jnp.float32)
    w_s_f = jnp.asarray(rng.normal(size=(v, d_s)) * 0.3, jnp.float32)
    w_s = quantize_head_int8(w_s_f)
    w_deq = (w_s["w_int8"].astype(jnp.float32)
             * w_s["scale"][:, None].astype(jnp.float32))
    h_t = jnp.asarray(rng.normal(size=(n, d_t)), jnp.float32)
    w_t = jnp.asarray(rng.normal(size=(v, d_t)) * 0.3, jnp.float32)
    kd_w = jnp.asarray(rng.random(n), jnp.float32)
    ce_w = jnp.asarray(rng.random(n), jnp.float32)
    ids = jnp.asarray(rng.integers(0, vl, n), jnp.int32)

    def dense_kdce(hs):
        s = (hs @ w_deq.T)[:, :vl]
        t = (h_t @ w_t.T)[:, :vl]
        lse_s = jax.nn.logsumexp(s, axis=1)
        p_t = jax.nn.softmax(t, axis=1)
        kd = jnp.sum((lse_s - jnp.sum(p_t * s, axis=1)) * kd_w)
        ce = jnp.sum((lse_s - jnp.take_along_axis(
            s, ids[:, None], axis=1)[:, 0]) * ce_w)
        return kd + 0.5 * ce

    g_dense = jax.grad(dense_kdce)(h_s)

    def ours(hs):
        kd, ce = chunked_kd_ce(hs, w_s, h_t, w_t, kd_w, ce_w, ids, vl,
                               128, False, stream_dh)
        return kd + 0.5 * ce

    g_ours = jax.grad(ours)(h_s)
    # bf16 accumulator matmuls vs the fp32 dense oracle: elementwise noise
    # floor ~1e-3 of the gradient scale, direction essentially exact
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_dense),
                               rtol=2e-2, atol=2e-3)
    ge, go = np.asarray(g_dense, np.float64), np.asarray(g_ours, np.float64)
    cos = (ge * go).sum() / (np.linalg.norm(ge) * np.linalg.norm(go))
    assert cos > 0.9999, cos

    def dense_kd(hs):
        s = (hs @ w_deq.T)[:, :vl]
        t = (h_t @ w_t.T)[:, :vl]
        lse_s = jax.nn.logsumexp(s, axis=1)
        p_t = jax.nn.softmax(t, axis=1)
        return jnp.sum((lse_s - jnp.sum(p_t * s, axis=1)) * kd_w)

    g_dense2 = jax.grad(dense_kd)(h_s)
    g_ours2 = jax.grad(lambda hs: chunked_kd_cross_entropy(
        hs, w_s, h_t, w_t, kd_w, vl, 128, False, stream_dh))(h_s)
    np.testing.assert_allclose(np.asarray(g_ours2), np.asarray(g_dense2),
                               rtol=2e-2, atol=2e-3)


def test_frozen_head_streamed_lse_gather_matches_two_pass():
    """chunked_lse_and_gather(stream_dh=True) — the frozen-head streamed
    backward used by stage-1 CE and the DPO policy logp — is EXACT: same
    dh as the two-pass path (identity ds@W = g_lse*(p@W) + g_picked*W[ids])
    for both plain and int8 heads."""
    from llavamod_tpu.models.llm.decoder import quantize_head_int8

    rng = np.random.default_rng(5)
    n, d, v, vl = 48, 32, 512, 500
    h = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(v, d)) * 0.3, jnp.float32)
    ids = jnp.asarray(rng.integers(0, vl, n), jnp.int32)
    cl = jnp.asarray(rng.random(n), jnp.float32)
    cp = jnp.asarray(rng.random(n), jnp.float32)

    def obj(hh, head, stream):
        lse, picked = chunked_lse_and_gather(hh, head, ids, vl, 128, stream)
        return jnp.sum(lse * cl) + jnp.sum(picked * cp)

    for head, (rtol, atol) in ((w, (2e-5, 2e-6)),
                               (quantize_head_int8(w), (2e-2, 2e-3))):
        # plain f32 head: bit-class identical (the streamed form is the
        # same matmul in a different association).  int8 head: BOTH paths
        # run bf16 dequantized matmuls, so they agree to bf16 noise only.
        v0, g0 = jax.value_and_grad(obj)(h, head, False)
        v1, g1 = jax.value_and_grad(obj)(h, head, True)
        assert float(v0) == float(v1)  # forward identical
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=rtol, atol=atol)
