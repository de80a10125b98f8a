"""GPipe-style pipeline parallelism over the mesh 'pipe' axis.

The reference has no pipeline parallelism — DeepSpeed ZeRO only, with
model parallelism explicitly disabled (reference builder.py:382-383
comments out mp_size) — so, like TP and SP, this is a TPU-native
extension beyond the reference (SURVEY.md §2.10).

Design (the standard JAX/TPU pipelining recipe): the period-stacked layer
tree's leading repeat axis is sharded over 'pipe', so each of the P stages
owns a contiguous block of layer repeats.  Inside a `jax.shard_map` that
is manual ONLY over 'pipe' (axis_names={'pipe'} — data/fsdp/expert/tensor
stay under GSPMD, so FSDP/EP/TP compose with PP unchanged), the batch is
split into M microbatches and one lax.scan runs the M + P - 1 pipeline
ticks:

  tick t: stage 0 ingests microbatch t; every stage applies its local
          repeats to its in-flight activation; stage P-1 banks its result
          (microbatch t - P + 1); activations ppermute one stage down.

Because the whole schedule is one differentiable scan, `jax.grad` gives
the reverse (backward) pipeline for free: the ppermute transposes to the
opposite shift and the scan reverses, with the same (P-1)/(M+P-1) bubble
fraction.  Bubble ticks compute on zeros and are masked out of the banked
outputs and the aux-loss accumulator; the banked outputs are made
replicated over 'pipe' with a masked psum so the final-norm/loss tail
outside runs unchanged.

Engaged automatically by decoder._scan_layers whenever the ambient mesh
has pipe > 1 (trainer flag --pipeline_parallel).  Semantics note: MoE
gating groups see one MICROBATCH at a time — the same per-rank gating
semantics DeepSpeed-MoE has under data parallelism — so capacity/dropping
can differ from the non-pipelined program unless moe_gating_group_size
divides the microbatch token count (then they are bit-identical; see
tests/test_pipeline.py).  Limitations: the cached decode path and the
per-token router-prob dump run non-pipelined (gating probes return empty
under PP).  Pallas flash attention works inside the pipe-manual region:
ops/attention.py::_flash_under_mesh re-enters a nested shard_map over
the remaining non-Manual axes (batch over data/fsdp, heads over tensor),
so the kernel never sits in an auto-GSPMD region it is opaque to
(tests/test_pipeline.py::test_pipeline_flash_attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipe_size() -> int:
    """Size of the ambient mesh's 'pipe' axis (1 if no mesh / no axis)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty or "pipe" not in mesh.axis_names:
        return 1
    return int(mesh.shape["pipe"])


def pipeline_layers(cfg, stacked, x, positions, segment_ids, train,
                    attn_impl, remat, prefix_mask=None):
    """Run the decoder layer stack as a GPipe microbatch pipeline.

    Same contract as the scan in decoder._scan_layers: returns
    (x_out [B, T, D], aux_total scalar).  `stacked` is the period-stacked
    layer tree list (one tree per layer-in-period, leaves [reps, ...],
    reps divisible by the pipe axis size).
    """
    from llavamod_tpu.models.llm import decoder

    mesh = jax.sharding.get_abstract_mesh()
    pp = int(mesh.shape["pipe"])
    b, t, d = x.shape
    m = cfg.pipeline_microbatches or pp
    assert b % m == 0, (
        f"batch {b} not divisible into {m} microbatches "
        f"(set pipeline_microbatches to a divisor of the batch)")
    io_dtype = x.dtype
    reps = jax.tree_util.tree_leaves(stacked[0])[0].shape[0]
    assert reps % pp == 0, (
        f"{reps} layer repeats not divisible by pipe={pp}")
    period = len(stacked)
    bm = b // m

    # Canonicalize the microbatched inputs' sharding at the shard_map
    # boundary: [M, Bm, ...] with Bm over ('data','fsdp') when divisible,
    # else replicated.  Without this, whatever sharding GSPMD propagated
    # into the [B, ...] inputs (e.g. the multimodal splice's) can hit an
    # XLA spmd_partitioner_util.cc:495 CHECK when combined with the MoE
    # collectives inside the pipe-manual region (seen on jax 0.9.0 with
    # segment-id-masked gating).
    batch_axes = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)
    n_batch = 1
    for a in batch_axes:
        n_batch *= int(mesh.shape[a])

    def to_mb(a):
        if a is None:
            return None
        a = a.reshape((m, bm) + a.shape[1:])
        if batch_axes and bm % n_batch == 0:
            spec = P(None, batch_axes, *([None] * (a.ndim - 2)))
        else:
            spec = P(*([None] * a.ndim))
        return jax.lax.with_sharding_constraint(a, spec)

    # The input buffer rides the shard_map boundary in f32 (exact upcast;
    # cast back per tick).  It is replicated over 'pipe', so its cotangent
    # is a psum over 'pipe' — in bf16 that all-reduce (whose region the
    # sdy pipeline decorates with a sharding_constraint) crashes XLA-CPU's
    # AllReducePromotion pass ("Invalid binary instruction opcode copy",
    # hlo_instruction.cc:1585, jax 0.9.0); in f32 the pass never touches
    # it.  On TPU the extra [B,T,D] f32 buffer is noise next to the layer
    # activations, and bf16 psum never crashed there anyway.
    x_mb = to_mb(x).astype(jnp.float32)
    pos_mb = to_mb(positions)
    seg_mb = to_mb(segment_ids)
    pfx_mb = to_mb(prefix_mask)

    def body(stacked_local, x_mb, pos_mb, seg_mb, pfx_mb):
        idx = jax.lax.axis_index("pipe")
        ticks = m + pp - 1

        def tick(carry, tt):
            state, outputs, aux_acc = carry
            mb_i = tt - idx                      # this stage's microbatch
            valid = jnp.logical_and(mb_i >= 0, mb_i < m)
            take = jnp.clip(mb_i, 0, m - 1)
            pick = lambda a: (None if a is None else  # noqa: E731
                              jax.lax.dynamic_index_in_dim(a, take, 0, False))
            pos_cur, seg_cur, pfx_cur = pick(pos_mb), pick(seg_mb), pick(pfx_mb)
            # stage 0 ingests microbatch tt (re-ingests m-1 during the
            # drain ticks; those never reach the banking stage in time)
            inject = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(tt, 0, m - 1), 0, False).astype(io_dtype)
            state = jnp.where(idx == 0, inject, state)

            def block(s, rep_params):
                aux_sum = jnp.zeros((), jnp.float32)
                for j in range(period):
                    s, _, aux, _probs = decoder.layer_forward(
                        cfg, rep_params[j], s, pos_cur, seg_cur, j, None,
                        train, attn_impl, prefix_mask=pfx_cur)
                    s = decoder._seq_constraint(cfg, s)
                    aux_sum = aux_sum + aux
                return s, aux_sum

            if remat:
                # same remat_policy -> checkpoint-policy mapping as the
                # non-PP scan (decoder._scan_layers); 'moe' is handled
                # inside layer_forward (_moe_block_rematted) either way
                policy = None
                if cfg.remat_policy == "dots":
                    policy = (jax.checkpoint_policies
                              .dots_with_no_batch_dims_saveable)
                blk = jax.checkpoint(block, policy=policy)
            else:
                blk = block
            state2, aux_r = jax.lax.scan(
                blk, state, tuple(stacked_local),
                unroll=max(1, cfg.scan_unroll))
            aux_acc = aux_acc + jnp.sum(aux_r) * valid.astype(jnp.float32)

            # last stage banks its (valid) result into the output buffer
            bank = jnp.logical_and(valid, idx == pp - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, take, 0, False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(bank, state2, cur), take, 0)

            state = jax.lax.ppermute(
                state2, "pipe", [(i, (i + 1) % pp) for i in range(pp)])
            return (state, outputs, aux_acc), None

        carry0 = (jnp.zeros((bm, t, d), io_dtype),
                  jnp.zeros((m, bm, t, d), io_dtype),
                  jnp.zeros((), jnp.float32))
        (_, outputs, aux_acc), _ = jax.lax.scan(
            tick, carry0, jnp.arange(ticks))

        # replicate the last stage's banked outputs (and the per-stage aux
        # sums) across 'pipe' so the tail outside is stage-agnostic.  The
        # masked psum runs in f32: a bf16 all-reduce inside the manual
        # region hits an XLA-CPU AllReducePromotion crash ("Invalid binary
        # instruction opcode copy", hlo_instruction.cc:1585 on jax 0.9.0),
        # and on TPU the f32 accumulate costs nothing extra for one term.
        mask = (idx == pp - 1).astype(jnp.float32)
        x_out = jax.lax.psum(outputs.astype(jnp.float32) * mask,
                             "pipe").astype(outputs.dtype)
        # per-layer aux is a mean over gating groups; microbatches are
        # groups here, so average over the m contributions
        aux_total = jax.lax.psum(aux_acc, "pipe") / m
        return x_out.reshape(b, t, d), aux_total

    param_specs = [
        jax.tree_util.tree_map(lambda _: P("pipe"), s) for s in stacked]
    optional = lambda a: P() if a is not None else None  # noqa: E731
    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(param_specs, P(), optional(pos_mb), optional(seg_mb),
                  optional(pfx_mb)),
        out_specs=(P(), P()),
        axis_names={"pipe"}, check_vma=False,
    )(stacked, x_mb, pos_mb, seg_mb, pfx_mb)
    return out
