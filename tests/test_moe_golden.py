"""Golden parity: our gating vs the DeepSpeed top1/top2 gating algorithm.

The oracle (tests/golden/ds_top2gating_ref.py) is a torch transcription of
deepspeed.moe.sharded_moe's gating — the layer the reference instantiates
(llava_qwen1_5_moe.py:534-546).  Dispatch masks, combine weights, capacity,
drop ordering, and the aux loss must match to fp32 precision across seeds
and capacity regimes (the BASELINE.md 1e-3 loss-parity target needs the
gating, the dominant discrete choice, to be exact)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from golden.ds_top2gating_ref import top1gating, top2gating
from llavamod_tpu.ops.moe import GatingConfig, top_k_gating


def _ours(logits, k, cf, min_cap, train=True):
    cfg = GatingConfig(num_experts=logits.shape[1], top_k=k,
                       capacity_factor=cf, eval_capacity_factor=cf,
                       min_capacity=min_cap)
    out = top_k_gating(jnp.asarray(logits), cfg, train=train)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("cf,min_cap", [(1.5, 4), (1.0, 4), (0.5, 1), (2.0, 8)])
def test_top2_parity(seed, cf, min_cap):
    rng = np.random.default_rng(seed)
    s, e = 64, 4
    logits = rng.normal(size=(s, e)).astype(np.float32)

    l_aux, combine, dispatch, cap = top2gating(torch.tensor(logits), cf, min_cap)
    ours = _ours(logits, 2, cf, min_cap)

    assert ours.combine.shape == (s, e, cap)
    np.testing.assert_allclose(np.asarray(ours.combine),
                               combine.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.dispatch) > 0,
                                  dispatch.numpy())
    assert float(ours.aux_loss) == pytest.approx(float(l_aux), rel=1e-6)


@pytest.mark.parametrize("seed", [0, 7])
def test_top1_parity(seed):
    rng = np.random.default_rng(seed)
    s, e = 32, 4
    logits = rng.normal(size=(s, e)).astype(np.float32)
    l_aux, combine, dispatch, cap = top1gating(torch.tensor(logits), 1.0, 2)
    ours = _ours(logits, 1, 1.0, 2)
    assert ours.combine.shape == (s, e, cap)
    np.testing.assert_allclose(np.asarray(ours.combine),
                               combine.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.dispatch) > 0,
                                  dispatch.numpy())
    assert float(ours.aux_loss) == pytest.approx(float(l_aux), rel=1e-6)


def test_drop_order_second_choices_behind_first():
    """With capacity 1 and every token preferring expert 0, only the first
    token's first choice survives; all second choices (queued behind ALL
    first choices, sharded_moe locations2 += sum(mask1)) drop."""
    s, e = 4, 2
    logits = np.tile(np.array([[5.0, 1.0]], np.float32), (s, 1))
    l_aux, combine, dispatch, cap = top2gating(torch.tensor(logits), 0.125, 1)
    assert cap == 1
    ours = _ours(logits, 2, 0.125, 1)
    np.testing.assert_array_equal(np.asarray(ours.dispatch) > 0,
                                  dispatch.numpy())
    # expert0 slot0 <- token0 first choice; expert1 slot0 <- token0 2nd choice
    d = np.asarray(ours.dispatch)
    assert d[0, 0, 0] == 1 and d[0, 1, 0] == 1
    assert d[1:].sum() == 0


def test_eval_capacity_factor_used_when_not_training():
    logits = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)
    cfg = GatingConfig(num_experts=4, top_k=2, capacity_factor=0.5,
                       eval_capacity_factor=2.0, min_capacity=1)
    train_out = top_k_gating(jnp.asarray(logits), cfg, train=True)
    eval_out = top_k_gating(jnp.asarray(logits), cfg, train=False)
    assert train_out.combine.shape[2] == 4   # 16/4*0.5*2
    assert eval_out.combine.shape[2] == 16   # 16/4*2.0*2
