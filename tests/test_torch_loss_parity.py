"""Loss parity against torch transcriptions of the reference trainer math.

BASELINE.md's target is KL/DPO loss parity to 1e-3 vs the PyTorch
reference; these oracles re-implement the reference's exact formulas in
torch (compute_align_loss, align_trainer.py:455-528; get_logp + dpo_loss,
dpo_trainer.py:462-562) and compare our chunked/fused JAX losses on the
same inputs."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from llavamod_tpu.ops.losses import (
    dpo_loss,
    kd_align_loss,
    sequence_log_prob,
)

pytestmark = pytest.mark.slow  # see pyproject: -m 'not slow' skips this file


def _rand(shape, seed, scale=1.0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32) * scale


def torch_align_loss(logits_s, logits_t, labels, vocab_limit):
    """compute_align_loss (align_trainer.py:455-528): -sum_v p_t logp_s,
    token-mean over labels != -100, vocab sliced to [:vocab_limit]."""
    p_t = F.softmax(logits_t[:, :, :vocab_limit].float(), dim=-1)
    logp_s = F.log_softmax(logits_s[:, :, :vocab_limit].float(), dim=-1)
    per_tok = -(p_t * logp_s).sum(-1)
    mask = labels != -100
    return (per_tok * mask).sum() / mask.sum()


def torch_get_logp(logits, labels):
    """DPOTrainer.get_logp (dpo_trainer.py:462-495): shift, gather label
    logps, sequence-sum over the response mask."""
    logits = logits[:, :-1].float()
    labels = labels[:, 1:].clone()
    mask = labels != -100
    labels[labels == -100] = 0
    per_tok = torch.gather(F.log_softmax(logits, dim=-1), 2,
                           labels.unsqueeze(2)).squeeze(2)
    return (per_tok * mask).sum(-1)


def test_kd_loss_matches_reference_math():
    b, t, ds, dt, v = 2, 12, 16, 24, 80
    h_s = _rand((b, t, ds), 0)
    h_t = _rand((b, t, dt), 1)
    w_s = _rand((v + 7, ds), 2, 0.3)   # student vocab > shared prefix
    w_t = _rand((v + 3, dt), 3, 0.3)
    labels = np.random.default_rng(4).integers(0, v, (b, t)).astype(np.int32)
    labels[:, :3] = -100

    ours = kd_align_loss(jnp.asarray(h_s), jnp.asarray(w_s), jnp.asarray(h_t),
                         jnp.asarray(w_t), jnp.asarray(labels),
                         vocab_limit=v, chunk=32)

    logits_s = torch.tensor(h_s) @ torch.tensor(w_s).T
    logits_t = torch.tensor(h_t) @ torch.tensor(w_t).T
    ref = torch_align_loss(logits_s, logits_t, torch.tensor(labels.astype(np.int64)), v)
    assert float(ours.loss) == pytest.approx(float(ref), abs=1e-3, rel=1e-4)


@pytest.mark.parametrize("loss_type", ["sigmoid", "hinge", "ipo", "kto_pair"])
def test_dpo_loss_matches_reference_math(loss_type):
    b, t, d, v = 3, 10, 16, 60
    beta = 0.1

    def logps(seed_h, seed_l):
        h = _rand((b, t, d), seed_h)
        w = _rand((v, d), 99, 0.3)
        labels = np.random.default_rng(seed_l).integers(0, v, (b, t)).astype(np.int32)
        labels[:, :2] = -100
        ours = sequence_log_prob(jnp.asarray(h), jnp.asarray(w),
                                 jnp.asarray(labels), chunk=16)
        logits = torch.tensor(h) @ torch.tensor(w).T
        ref = torch_get_logp(logits, torch.tensor(labels.astype(np.int64)))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                   rtol=1e-4, atol=1e-4)
        return torch.tensor(np.asarray(ours))

    pc, pr = logps(10, 11), logps(12, 13)
    rc, rr = logps(14, 15), logps(16, 17)

    out = dpo_loss(jnp.asarray(pc.numpy()), jnp.asarray(pr.numpy()),
                   jnp.asarray(rc.numpy()), jnp.asarray(rr.numpy()),
                   beta=beta, loss_type=loss_type)

    # torch transcription of dpo_trainer.py:497-562
    pi = pc - pr
    ref_ratio = rc - rr
    logits = pi - ref_ratio
    if loss_type == "sigmoid":
        ref_losses = -F.logsigmoid(beta * logits)
    elif loss_type == "hinge":
        ref_losses = torch.relu(1 - beta * logits)
    elif loss_type == "ipo":
        ref_losses = (logits - 1 / (2 * beta)) ** 2
    else:  # kto_pair (HALOs eq.7)
        chosen_kl = (pc - rc).mean().clamp(min=0)
        rejected_kl = (pr - rr).mean().clamp(min=0)
        ref_losses = torch.cat([
            1 - torch.sigmoid(beta * ((pc - rc) - rejected_kl)),
            1 - torch.sigmoid(beta * (chosen_kl - (pr - rr))),
        ], 0)
    np.testing.assert_allclose(np.asarray(out.losses), ref_losses.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.chosen_rewards),
                               (beta * (pc - rc)).numpy(), rtol=1e-4, atol=1e-6)
