"""Fused backward+update align step: the record train set on one chip.

The standard align step (train/steps.py::make_align_step) materializes the
FULL trainable-gradient tree before the optimizer update — 4.06 GB of bf16
for the record FFN+router train set (dense2sparse_distillation.sh:56,
2.03B trainable params), which is exactly the remaining OOM gap on a
16 GB v5e after Adafactor removes the Adam state.

This step never builds that buffer.  The backward pass is written as an
explicit `lax.scan` over the stacked layer repeats in reverse:

  forward:  scan over repeats, saving each repeat's INPUT activation
            ([reps, B, T, D] bf16 — ~100 MB at the flagship shapes);
  tail:     final-norm + vocab-chunked KD(+CE) loss, vjp'd to d loss/d x_L;
  backward: for each repeat (last to first) re-run its forward under
            jax.vjp from the saved input (per-repeat rematerialization),
            get (d params_rep, d x), apply the Adafactor update to that
            repeat IN PLACE in the scan carry, and pass d x down.

Peak gradient memory is ONE repeat's trainable slice (~0.34 GB) instead of
the whole tree; the params stack rides the scan carry, so with donation
the update is in-place.  Semantics are IDENTICAL to grad-then-update:
every vjp recomputes its forward from the pre-update params (updates only
become visible to the next step), and the update rule is per-block
Adafactor (train/adafactor.py) — pinned against the unfused reference
path in tests/test_fused_align.py.

Restrictions (asserted): align stage, scan_layers with a pre-stacked
param tree, optimizer='adafactor', no LoRA, compute dtype == param
storage dtype, vision tower frozen, and no int8-quantized head when the
head is trainable.  Trainable params may live in the layer stack, the
(video) projector (head-section vjp), or embed / lm_head / final_norm
(head- and tail-section vjps, gradients merged for tied embeddings) —
so recipes that unfreeze the embedding or head don't fall off the
fused-memory path.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from llavamod_tpu.models import llava
from llavamod_tpu.models.llava import LlavaConfig, MultimodalBatch
from llavamod_tpu.models.llm import decoder
from llavamod_tpu.ops.losses import kd_align_loss, kd_ce_align_loss
from llavamod_tpu.train import adafactor
from llavamod_tpu.train.config import TrainConfig
from llavamod_tpu.train.optim import (
    TrainState,
    make_lr_schedule,
    trainable_mask,
)
from llavamod_tpu.train.steps import (
    _DTYPES,
    _can_share_tower,
    _cast_tree,
    _shared_tower_feats,
)

Metrics = Dict[str, jnp.ndarray]


def _stacked_trees(params):
    layers = params["llm"]["layers"]
    assert isinstance(layers, dict) and "stacked" in layers, (
        "fused step needs a pre-stacked layer tree (decoder.stack_layers)")
    return layers["stacked"]


def _check_supported(student_cfg: LlavaConfig, tcfg: TrainConfig, mask):
    assert tcfg.optimizer == "adafactor", (
        "the fused backward applies per-repeat Adafactor updates; "
        "set optimizer='adafactor'")
    # grad_accum_steps > 1 is supported by FOLDING the microbatches into
    # the batch axis of one program (see make_fused_align_step): the vjp
    # then sums the per-microbatch gradients on the fly and the full
    # gradient buffer still never exists.
    assert student_cfg.llm.scan_layers, "fused step requires scan_layers"
    assert _DTYPES[tcfg.compute_dtype] is not None
    # trainable leaves may live in the layer stack, the (video) projector,
    # or the fused head/tail sections (embed / lm_head / final_norm —
    # differentiated through the head-embed and tail-loss vjps).  Only the
    # vision tower stays frozen-only (true of every reference recipe:
    # clip_encoder.py:31 never unfreezes it).
    _OUTER = ("projector", "video_projector", "llm/embed", "llm/lm_head",
              "llm/final_norm")
    def _flag(path, m):
        p = "/".join(str(getattr(q, "key", q)) for q in path)
        if m and not (p.startswith("llm/layers")
                      or any(p.startswith(o) for o in _OUTER)):
            raise AssertionError(
                f"fused align step cannot update '{p}' — only layer-stack, "
                f"(video) projector, embed, lm_head and final_norm params "
                f"are supported")
    jax.tree_util.tree_map_with_path(_flag, mask)
    if tcfg.student_head_quant and _head_trainable(student_cfg, mask):
        raise AssertionError(
            "student_head_quant with a TRAINABLE head: the int8 head "
            "matmul's custom VJP skips dw entirely (ops/losses.py) — "
            "unfreeze the head only with a float head")


def _any(mask_sub) -> bool:
    return any(jax.tree_util.tree_leaves(mask_sub))


def _head_trainable(student_cfg: LlavaConfig, mask) -> bool:
    """True when the LM head weight receives updates — an explicit lm_head,
    or the tied embedding (decoder.lm_head_weight falls back to it)."""
    lm = mask["llm"]
    if "lm_head" in lm:
        return _any(lm["lm_head"])
    return student_cfg.llm.tie_word_embeddings and _any(lm.get("embed", ()))


def _outer_sections(params, mask):
    """The trainable params OUTSIDE the layer stack, split by LR group:
    proj (projector + video_projector — mm_projector_lr) and extras
    (llm embed / lm_head / final_norm — the main lr).  Extras subtrees with
    no trainable leaf are excluded so their (possibly [V, D]-sized) vjps
    are never built."""
    proj = {k: params[k] for k in ("projector", "video_projector")
            if k in params}
    proj_mask = {k: mask[k] for k in proj}
    extras = {k: params["llm"][k]
              for k in ("embed", "lm_head", "final_norm")
              if k in params["llm"] and _any(mask["llm"][k])}
    extras_mask = {k: mask["llm"][k] for k in extras}
    return proj, proj_mask, extras, extras_mask


def init_fused_state(params, student_cfg: LlavaConfig,
                     tcfg: TrainConfig) -> TrainState:
    """TrainState whose opt_state is the fused layout: per-repeat-sliced
    Adafactor statistics for the stacked layer trees + the projector."""
    mask = trainable_mask(params, tcfg)
    _check_supported(student_cfg, tcfg, mask)
    stacked = _stacked_trees(params)
    mask_stacked = _stacked_trees({"llm": mask["llm"]})

    compute_dtype = _DTYPES[tcfg.compute_dtype]

    def init_stacked_leaf(p, m):
        if not m:
            return {}
        assert p.dtype == compute_dtype, (
            f"fused updates are in-place: params must be stored in the "
            f"compute dtype ({tcfg.compute_dtype}), got {p.dtype}")
        # state for ONE repeat's slice, then stacked on the reps axis —
        # per-weight-matrix Adafactor blocks, not whole-stack blocks
        reps = p.shape[0]
        one = adafactor.init_leaf(p[0])
        return {k: jnp.zeros((reps,) + v.shape, v.dtype)
                for k, v in one.items()}

    opt_layers = [jax.tree_util.tree_map(init_stacked_leaf, s, ms)
                  for s, ms in zip(stacked, mask_stacked)]
    proj, proj_mask, extras, extras_mask = _outer_sections(params, mask)
    opt_state = {
        "layers": opt_layers,
        "projector": adafactor.init_tree(proj["projector"],
                                         proj_mask["projector"]),
    }
    if "video_projector" in proj:
        opt_state["video_projector"] = adafactor.init_tree(
            proj["video_projector"], proj_mask["video_projector"])
    if extras:
        opt_state["extras"] = adafactor.init_tree(extras, extras_mask)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state)


def make_fused_align_step(student_cfg: LlavaConfig, teacher_cfg: LlavaConfig,
                          tcfg: TrainConfig) -> Callable:
    """step(state, teacher_params, batch) -> (state, metrics).

    Same contract as make_align_step; state must come from
    init_fused_state.

    Gradient accumulation (tcfg.grad_accum_steps = M > 1) is IN-BATCH:
    the caller concatenates the M microbatches along the batch axis
    (train/loader.py::fold_microbatches) and ONE program computes the
    M-microbatch update.  The vjp sums per-microbatch gradients on the
    fly — the whole-tree gradient buffer that per-call accumulation
    (optax.MultiSteps) would need still never materializes.  Semantics
    match MultiSteps' default mean-of-gradients exactly: the tail loss is
    normalized PER MICROBATCH (each microbatch's token count, like the M
    separate calls would), then averaged — pinned against the MultiSteps
    path in tests/test_fused_align.py."""
    cfg = student_cfg
    vocab_limit = tcfg.kd_vocab_limit or min(student_cfg.llm.vocab_size,
                                             teacher_cfg.llm.vocab_size)
    share_tower = _can_share_tower(tcfg, student_cfg, teacher_cfg)
    dtype = _DTYPES[tcfg.compute_dtype]
    lr_sched = make_lr_schedule(tcfg, tcfg.learning_rate)
    proj_lr_sched = make_lr_schedule(
        tcfg, tcfg.mm_projector_lr or tcfg.learning_rate)
    coef = (cfg.llm.router_aux_loss_coef
            if (cfg.llm.is_moe and tcfg.moe_loss_enable) else 0.0)
    af_kw = dict(weight_decay_rate=tcfg.weight_decay or None)

    def teacher_forward(teacher_params, batch, tower_feats, positions,
                        n_chunks):
        """Frozen teacher hidden states + head weight.

        n_chunks > 1 runs the teacher DECODER in batch-row chunks
        (lax.map) after one folded embed+splice: at accum=8 record shapes
        the folded-batch teacher forward paid ~20% over 8x the B=1 time
        (working-set pressure, profiled in BENCH_NOTES round-8).  Exact
        for a dense teacher — attention is per-sequence and norms are
        per-token, so batch rows never interact."""
        tp = _cast_tree(teacher_params, dtype)
        tb = batch._replace(pixels=batch.pixels.astype(dtype))
        if n_chunks > 1:
            emb = llava.multimodal_embed(tp, teacher_cfg, tb, tower_feats)
            bb, tt = emb.shape[0], emb.shape[1]
            ck = bb // n_chunks
            seg = tb.segment_ids

            def one(args):
                e_c, p_c, s_c = args
                out = decoder.forward(
                    tp["llm"], teacher_cfg.llm, inputs_embeds=e_c,
                    positions=p_c, segment_ids=s_c, train=False,
                    attn_impl=tcfg.attn_impl)
                return out.hidden

            h = jax.lax.map(one, (
                emb.reshape(n_chunks, ck, tt, emb.shape[-1]),
                positions.reshape(n_chunks, ck, tt),
                (seg.reshape(n_chunks, ck, tt) if seg is not None
                 else jnp.ones((n_chunks, ck, tt), jnp.int32))))
            hidden = h.reshape(bb, tt, h.shape[-1])
        else:
            out = llava.forward(tp, teacher_cfg, tb, train=False,
                                attn_impl=tcfg.attn_impl,
                                tower_feats=tower_feats)
            hidden = out.hidden
        w = llava.lm_head_weight(tp, teacher_cfg)
        return jax.lax.stop_gradient(hidden), jax.lax.stop_gradient(w)

    def rep_forward(rep_params, x, positions, segment_ids):
        """One structural period of layers; returns (x_out, aux_sum)."""
        aux_sum = jnp.zeros((), jnp.float32)
        for j in range(len(rep_params)):
            x, _, aux, _probs = decoder.layer_forward(
                cfg.llm, rep_params[j], x, positions, segment_ids, j, None,
                True, tcfg.attn_impl)
            x = decoder._seq_constraint(cfg.llm, x)
            aux_sum = aux_sum + aux
        return x, aux_sum

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, teacher_params,
             batch: MultimodalBatch) -> Tuple[TrainState, Metrics]:
        params = state.params
        mask = trainable_mask(params, tcfg)
        mask_stacked = _stacked_trees({"llm": mask["llm"]})
        pstack = _stacked_trees(params)
        ostack = state.opt_state["layers"]
        reps = jax.tree_util.tree_leaves(pstack[0])[0].shape[0]
        count = state.step
        lr = lr_sched(count).astype(jnp.float32)
        proj_lr = proj_lr_sched(count).astype(jnp.float32)

        b, t = batch.input_ids.shape
        positions = (batch.positions if batch.positions is not None
                     else jnp.broadcast_to(jnp.arange(t)[None, :], (b, t)))
        cbatch = batch._replace(pixels=batch.pixels.astype(dtype))

        accum = max(1, tcfg.grad_accum_steps)
        assert b % accum == 0, (
            f"fused accumulation folds microbatches into the batch axis: "
            f"batch rows ({b}) must be grad_accum_steps ({accum}) x the "
            f"per-microbatch size (train/loader.py::fold_microbatches)")
        # The microbatched backward (_rep_vjp_microbatched) re-runs each
        # repeat's forward one microbatch at a time, so it is the vjp of the
        # folded forward ONLY if the MoE routing decisions factor across
        # microbatches.  Global gating (moe_gating_group_size == 0) pools
        # capacity/drops/aux over the whole folded token set — recomputing
        # per microbatch would differentiate a DIFFERENT function (silently
        # wrong gradients).  Gating groups that tile the microbatch make the
        # recompute exact (groups never straddle a microbatch boundary: the
        # [b*t] flatten is row-major, so batch-axis splits land on group
        # boundaries iff (b/accum)*t is a group multiple).  This same
        # condition is what makes the in-batch fold match M separate
        # MultiSteps calls' routing at all.
        mb_gating_exact = True
        if cfg.llm.is_moe and accum > 1:
            group = cfg.llm.moe_gating_group_size
            mb_gating_exact = group > 0 and ((b // accum) * t) % group == 0
            if not mb_gating_exact:
                warnings.warn(
                    "fused accumulation with MoE + global gating "
                    f"(moe_gating_group_size={group}, microbatch tokens "
                    f"{(b // accum) * t}): routing pools capacity across the "
                    "folded microbatches, so the backward uses the exact "
                    "folded vjp (higher residual memory) and the update is "
                    "NOT bit-equal to grad_accum_steps separate calls.  Set "
                    "moe_gating_group_size to a divisor of the microbatch "
                    "token count for exact accumulation semantics.",
                    stacklevel=2)

        # --- frozen tower once; teacher forward (stop-grad) ---
        tower = (_shared_tower_feats(params, cfg, cbatch, tcfg)
                 if share_tower else None)
        n_tc = tcfg.fused_teacher_chunks
        if n_tc < 0:
            # auto: 1-row chunks, only when accumulating.  Swept at record
            # shapes (7b int8 teacher, 8x1 fold, T=2048, v5e) AFTER the
            # fused wqkv/gate_up int8 teacher layout: 1-row 4966 tok/s >
            # 2-row 4745 > folded.  (Pre-fusion the order was reversed —
            # 2-row 4733 > folded 4572 > 1-row 4533 — the wide fused
            # weights changed the per-chunk working set; 4-row chunks hit
            # an XLA emitter cliff either way.)  BENCH_NOTES round-8/10.
            n_tc = b if accum > 1 else 1
        if teacher_cfg.llm.is_moe or b % max(1, n_tc) != 0:
            n_tc = 1  # row chunking is only exact for a dense teacher
        h_t, w_t = teacher_forward(teacher_params, cbatch, tower, positions,
                                   n_tc)

        # --- head section: embeddings + projector + splice, vjp'd wrt the
        # trainable params feeding the first layer: the (video) projector
        # and, when trainable, the token embedding ---
        llm_p = params["llm"]
        proj_sec, proj_mask_sec, extras, extras_mask = _outer_sections(
            params, mask)
        head_train = dict(proj_sec)
        if "embed" in extras:
            head_train["embed"] = extras["embed"]

        def head_fn(ht):
            llm_h = dict(llm_p)
            if "embed" in ht:
                llm_h["embed"] = ht["embed"]
            tree = {"llm": llm_h, "projector": ht["projector"]}
            if "video_projector" in ht:
                tree["video_projector"] = ht["video_projector"]
            if tower is None:
                tree["vision"] = params["vision"]  # frozen (stop-grad inside)
            x0 = llava.multimodal_embed(tree, cfg, cbatch, tower)
            return decoder._seq_constraint(cfg.llm, x0)

        x0, head_vjp = jax.vjp(head_fn, head_train)

        # --- forward scan over repeats ---
        # fused_remat == 'repeat': save each repeat's INPUT; the backward
        # re-runs the repeat forward (per-repeat remat, minimum memory).
        # fused_remat == 'save_dots'/'save_all': carry each repeat's vjp
        # RESIDUALS out of the scan (jax.vjp's function is a pytree, so
        # lax.scan stacks its residual leaves on the reps axis) — the
        # backward then skips the forward recompute, trading ~1 student
        # forward of FLOPs for the residual memory Adafactor freed.
        rep_fwd = lambda p, x: rep_forward(  # noqa: E731
            p, x, positions, batch.segment_ids)
        save_residuals = tcfg.fused_remat != "repeat"

        # Forward-scan row chunking (lax.map inside each repeat body): the
        # folded working set is the accumulation tax; 2-row chunks are the
        # measured sweet spot for the teacher forward and apply here when
        # gating groups tile the chunk.  Values are identical (per-chunk
        # aux means average to the folded mean), so the microbatched
        # backward below differentiates the same function either way.
        fwd_chunks = tcfg.fused_fwd_chunks
        if fwd_chunks < 0:
            # auto: one chunk per accumulation microbatch — swept at the
            # record shapes: per-microbatch 4827 > 2-row 4805 > folded
            # 4732 tok/s (BENCH_NOTES round-8)
            fwd_chunks = accum if accum > 1 else 1
        rows_ok = (fwd_chunks > 1 and b % fwd_chunks == 0
                   and (b // fwd_chunks) % max(1, b // accum) == 0)
        if rows_ok and (not cfg.llm.is_moe or mb_gating_exact) \
                and not save_residuals:
            rows = b // fwd_chunks
            pos_c = positions.reshape(fwd_chunks, rows, t)
            seg_c = batch.segment_ids.reshape(fwd_chunks, rows, t)

            def rep_fwd(p, x):  # noqa: F811
                xc = x.reshape(fwd_chunks, rows, *x.shape[1:])
                xo, aux = jax.lax.map(
                    lambda a: rep_forward(p, a[0], a[1], a[2]),
                    (xc, pos_c, seg_c))
                return xo.reshape(x.shape), jnp.mean(aux)

        if tcfg.fused_remat == "save_dots":
            rep_fwd = jax.checkpoint(
                rep_fwd,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

        if save_residuals:
            def fwd_body(x, rep_params):
                (x_out, aux), vjp_fn = jax.vjp(rep_fwd, rep_params, x)
                return x_out, (vjp_fn, aux)
        else:
            def fwd_body(x, rep_params):
                x_out, aux = rep_fwd(rep_params, x)
                return x_out, (x, aux)

        x_last, (saved, aux_per_rep) = jax.lax.scan(
            fwd_body, x0, tuple(pstack),
            unroll=max(1, cfg.llm.scan_unroll))
        aux_total = jnp.sum(aux_per_rep)

        # --- tail: final norm + chunked KD(+CE) loss, vjp wrt x_last and
        # any trainable tail params (final_norm, the LM head weight) ---
        head_w_train = _head_trainable(cfg, mask)
        w_s = llava.lm_head_weight(params, cfg)
        if tcfg.student_head_quant and not isinstance(w_s, dict):
            # head quant + trainable head is refused in _check_supported
            w_s = jax.lax.stop_gradient(decoder.quantize_head_int8(w_s))
        tail_train = {}
        if "final_norm" in extras:
            tail_train["final_norm"] = extras["final_norm"]
        if head_w_train:
            tail_train["head_w"] = w_s

        def _one_microbatch_loss(hidden_m, labels_m, h_t_m, w):
            """Loss for one microbatch, normalized by ITS token count —
            the same numbers the M separate MultiSteps calls would see."""
            if tcfg.align_loss_type == "kd_lm":
                fused = kd_ce_align_loss(
                    hidden_m, w, h_t_m, w_t, labels_m,
                    vocab_limit=vocab_limit,
                    distill_all_tokens=tcfg.distill_all_tokens,
                    chunk=tcfg.vocab_chunk, int8_dh=tcfg.kd_int8_dh,
                stream_dh=tcfg.kd_stream_dh)
                return fused.kd_loss, fused.ce_loss, fused.kd_tokens
            kd = kd_align_loss(hidden_m, w, h_t_m, w_t, labels_m,
                               vocab_limit=vocab_limit,
                               distill_all_tokens=tcfg.distill_all_tokens,
                               chunk=tcfg.vocab_chunk,
                               int8_dh=tcfg.kd_int8_dh,
                stream_dh=tcfg.kd_stream_dh)
            return kd.loss, jnp.zeros(()), kd.num_tokens

        def tail_fn(xh, tt):
            fn_p = tt.get("final_norm", llm_p["final_norm"])
            w = tt.get("head_w", w_s)
            hidden = decoder._norm(cfg.llm, fn_p, xh)
            if accum == 1:
                kd_l, ce_l, ntok = _one_microbatch_loss(
                    hidden, batch.labels, h_t, w)
                return kd_l + ce_l, (kd_l, ce_l, ntok)
            # per-microbatch losses (lax.map = sequential scan, so the
            # chunked custom-VJP losses stream one microbatch at a time),
            # then MultiSteps' mean-of-gradients == mean of the losses
            mb = hidden.shape[0] // accum
            kd_l, ce_l, ntok = jax.lax.map(
                lambda a: _one_microbatch_loss(*a, w),
                (hidden.reshape(accum, mb, *hidden.shape[1:]),
                 batch.labels.reshape(accum, mb, batch.labels.shape[-1]),
                 h_t.reshape(accum, mb, *h_t.shape[1:])))
            return jnp.mean(kd_l) + jnp.mean(ce_l), (
                jnp.mean(kd_l), jnp.mean(ce_l), jnp.sum(ntok))

        loss_main, tail_vjp, aux_metrics = jax.vjp(tail_fn, x_last,
                                                   tail_train, has_aux=True)
        kd_loss, ce_loss, num_tokens = aux_metrics
        (g_last, d_tail) = tail_vjp(jnp.ones((), loss_main.dtype))

        # --- backward scan (reverse): per-repeat vjp + in-place update ---
        aux_cot = jnp.asarray(coef, jnp.float32)
        _is_empty = lambda x: isinstance(x, dict) and not x  # noqa: E731

        def _masked_sq_norm(grads, m):
            tot = jnp.zeros((), jnp.float32)
            for g_, m_ in zip(jax.tree_util.tree_leaves(grads),
                              jax.tree_util.tree_leaves(m)):
                if m_ and g_.dtype != jax.dtypes.float0:
                    tot = tot + jnp.sum(g_.astype(jnp.float32) ** 2)
            return tot

        def _f0_to_zero(tree):
            return jax.tree_util.tree_map(
                lambda d: (jnp.zeros((), jnp.float32)
                           if d.dtype == jax.dtypes.float0 else d), tree)

        bwd_mb = tcfg.fused_bwd_microbatches
        if bwd_mb < 0:
            # auto: 1 — swept at record shapes (BENCH_NOTES round-8): the
            # teacher forward's 2-row sweet spot does NOT transfer to the
            # backward (2-mb chunks 4563 < 1-mb 4732 tok/s); the residual
            # transient apparently crowds the backward's working set
            bwd_mb = 1
        if accum % max(1, bwd_mb) != 0:
            bwd_mb = 1
        n_bwd = accum // max(1, bwd_mb)

        def _rep_vjp_microbatched(rep_p, saved_i, g):
            """Per-repeat vjp in chunks of `bwd_mb` MICROBATCHES, summing
            dparams.

            The folded-batch vjp holds the whole repeat's residuals at the
            folded size; at record shapes with accum=8 that transient is
            what OOMs.  Running the chunks sequentially keeps the residual
            transient at chunk size while the summed dparams carry is one
            repeat's gradient slice.  Chunking along whole microbatches
            keeps gating exact (mb_gating_exact above).  The folded aux is
            the MEAN over microbatches (per-group normalization in
            ops/moe.py), so each chunk's aux cotangent is coef/n_chunks."""
            mb = saved_i.shape[0] // n_bwd
            split = lambda a: a.reshape(  # noqa: E731
                n_bwd, mb, *a.shape[1:])
            xm, gm = split(saved_i), split(g)
            pm, sm = split(positions), split(batch.segment_ids)
            mb_cot = aux_cot / n_bwd

            def one(x_m, g_m, p_m, s_m):
                _, vjp = jax.vjp(
                    lambda p, x: rep_forward(p, x, p_m, s_m), rep_p, x_m)
                dp, dx_m = vjp((g_m, mb_cot))
                return _f0_to_zero(dp), dx_m

            dp0, dx0 = one(xm[0], gm[0], pm[0], sm[0])

            def mb_body(acc, xs_):
                dp, dx_m = one(*xs_)
                return jax.tree_util.tree_map(jnp.add, acc, dp), dx_m

            dp_sum, dx_rest = jax.lax.scan(
                mb_body, dp0, (xm[1:], gm[1:], pm[1:], sm[1:]))
            dx = jnp.concatenate([dx0[None], dx_rest], 0).reshape(g.shape)
            return dp_sum, dx

        def bwd_body(carry, inp):
            g, ps, os_, gn = carry
            saved_i, i = inp
            rep_p = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, False), ps)
            rep_o = jax.tree_util.tree_map(
                lambda a: (a if _is_empty(a)
                           else jax.lax.dynamic_index_in_dim(a, i, 0, False)),
                os_, is_leaf=_is_empty)
            if save_residuals:
                # saved_i IS this repeat's vjp closure (residuals sliced off
                # the stacked leaves by the scan), taken at the PRE-update
                # params — no forward recompute
                dparams, dx = saved_i((g, aux_cot))
            elif accum > 1 and mb_gating_exact:
                dparams, dx = _rep_vjp_microbatched(rep_p, saved_i, g)
            else:
                # per-repeat remat: the vjp re-runs this repeat's forward
                # from the saved input with the PRE-update params
                _, vjp_px = jax.vjp(rep_fwd, rep_p, saved_i)
                dparams, dx = vjp_px((g, aux_cot))
            gn = gn + _masked_sq_norm(dparams, mask_stacked)
            new_p, new_o = adafactor.update_tree(
                rep_p, dparams, rep_o, mask_stacked, count, lr, **af_kw)
            ps = jax.tree_util.tree_map(
                lambda a, v: jax.lax.dynamic_update_index_in_dim(a, v, i, 0),
                ps, new_p)
            os_ = jax.tree_util.tree_map(
                lambda a, v: (a if _is_empty(a)
                              else jax.lax.dynamic_update_index_in_dim(
                                  a, v, i, 0)),
                os_, new_o, is_leaf=_is_empty)
            return (dx, ps, os_, gn), None

        (g0, new_pstack, new_ostack, gnorm_sq), _ = jax.lax.scan(
            bwd_body, (g_last, tuple(pstack), tuple(ostack),
                       jnp.zeros((), jnp.float32)),
            (saved, jnp.arange(reps)), reverse=True,
            unroll=max(1, cfg.llm.scan_unroll))

        # --- outer grads + updates ---
        (d_head,) = head_vjp(g0)
        new_params = dict(params)
        new_llm = dict(params["llm"])
        new_llm["layers"] = {"stacked": list(new_pstack)}
        new_opt = {"layers": list(new_ostack)}

        # (video) projector — the mm_projector_lr group
        for k in proj_sec:
            gnorm_sq = gnorm_sq + _masked_sq_norm(d_head[k],
                                                  proj_mask_sec[k])
            new_p_k, new_o_k = adafactor.update_tree(
                proj_sec[k], d_head[k], state.opt_state[k],
                proj_mask_sec[k], count, proj_lr, **af_kw)
            new_params[k] = new_p_k
            new_opt[k] = new_o_k

        # embed / lm_head / final_norm — the main-lr group.  Grads merge
        # across the two vjps: the embedding's lookup grad comes from the
        # head section; with tied weights the tail's head-matmul dW lands
        # on the embedding too.
        if extras:
            d_extras = {}
            if "embed" in extras:
                d_emb = dict(d_head["embed"])
                if head_w_train and "lm_head" not in params["llm"]:
                    d_emb["embedding"] = (d_emb["embedding"]
                                          + d_tail["head_w"])
                d_extras["embed"] = d_emb
            if "final_norm" in extras:
                d_extras["final_norm"] = d_tail["final_norm"]
            if "lm_head" in extras:
                # the align losses consume only the weight; a head bias
                # never enters the loss, so its gradient is exactly zero
                d_lm = {"weight": d_tail["head_w"]}
                if "bias" in extras["lm_head"]:
                    d_lm["bias"] = jnp.zeros_like(extras["lm_head"]["bias"])
                d_extras["lm_head"] = d_lm
            gnorm_sq = gnorm_sq + _masked_sq_norm(d_extras, extras_mask)
            new_ex, new_ex_o = adafactor.update_tree(
                extras, d_extras, state.opt_state["extras"], extras_mask,
                count, lr, **af_kw)
            for k, v in new_ex.items():
                new_llm[k] = v
            new_opt["extras"] = new_ex_o

        new_params["llm"] = new_llm

        loss = loss_main + coef * aux_total
        metrics: Metrics = {
            "loss": loss, "loss/align": kd_loss, "num_tokens": num_tokens,
            "grad_norm": jnp.sqrt(gnorm_sq),
        }
        if tcfg.align_loss_type == "kd_lm":
            metrics["loss/lm"] = ce_loss
        if coef:
            metrics["loss/moe_balance"] = aux_total
        return TrainState(state.step + 1, new_params, new_opt), metrics

    return step
