"""Worker for the REAL 2-process jax.distributed test (not a test file).

Launched by tests/test_multiprocess_distributed.py in two flavors:

  * --num-processes 2 --rank {0,1} --port P : joins a 2-process
    jax.distributed cluster over localhost, 4 virtual CPU devices per
    process (8 global), and runs the sharded align step with the
    production multihost data path: ProcessShardSampler per-process
    indices -> per-process local batch -> shard_batch(multihost=True)
    global-array assembly -> pjit step over a data=2 x fsdp=2 x expert=2
    global mesh -> orbax save -> restore -> one more step.  This is the
    reference's production topology (one process per accelerator,
    /root/reference/docs/TRAIN_EVAL.md:119) on the TPU-native stack.
  * --num-processes 1 : the single-process oracle on 8 local devices —
    the SAME global batches (assembled in the multihost row order:
    process r's local rows land at global rows [2r, 2r+1]) through the
    same step, so the parent can assert metric/checkpoint equality.

Rank 0 writes a JSON with the per-step metrics, a post-restore step, and
a global param checksum.
"""

import argparse
import json
import os


def _sample(idx, t, p, s):
    """Deterministic synthetic sample for global dataset index `idx`."""
    import numpy as np

    rng = np.random.RandomState(1000 + idx)
    ids = rng.randint(5, 500, (t,)).astype(np.int32)
    im = np.zeros((t,), bool)
    im[1:1 + p] = True
    ids = np.where(im, 1, ids)
    labels = np.where(im, -100, ids).astype(np.int32)
    if idx % 3 == 0:  # ragged supervision
        labels[-6:] = -100
    px = (rng.randn(1, 3, s, s) * 0.1).astype(np.float32)
    return ids, labels, px


def _local_batch(indices, global_rows, t, p, s):
    """Assemble a batch whose row r is dataset sample indices[r] sitting at
    GLOBAL batch row global_rows[r] (image_pos indexes the batch-global
    flat media table, data/collator.py semantics)."""
    import numpy as np

    rows = len(indices)
    ids = np.zeros((rows, t), np.int32)
    labels = np.zeros((rows, t), np.int32)
    px = np.zeros((rows, 1, 3, s, s), np.float32)
    image_mask = np.zeros((rows, t), bool)
    image_pos = np.zeros((rows, t), np.int32)
    for r, (idx, g) in enumerate(zip(indices, global_rows)):
        ids[r], labels[r], px[r] = _sample(idx, t, p, s)
        image_mask[r, 1:1 + p] = True
        image_pos[r, 1:1 + p] = g * p + np.arange(p)
    return {
        "input_ids": ids,
        "segment_ids": np.ones((rows, t), np.int32),
        "image_mask": image_mask,
        "image_pos": image_pos,
        "pixels": px,
        "pixel_valid": np.ones((rows, 1), bool),
        "labels": labels,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt-dir", required=True)
    args = ap.parse_args()

    import jax

    if args.num_processes > 1:
        try:  # CPU cross-process collectives ride gloo
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except AttributeError:
            pass
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.num_processes, process_id=args.rank)
        assert jax.process_count() == args.num_processes
        assert len(jax.local_devices()) == 4
    assert jax.device_count() == 8, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from llavamod_tpu.models import llava
    from llavamod_tpu.models.llava import LlavaConfig
    from llavamod_tpu.models.llm.config import tiny_config
    from llavamod_tpu.models.llm.upcycle import upcycle
    from llavamod_tpu.models.vision.vit import tiny_vision_config
    from llavamod_tpu.parallel.mesh import MeshConfig, make_mesh
    from llavamod_tpu.parallel.sharding import shard_batch, shard_params
    from llavamod_tpu.train import checkpoint as ckpt_mod
    from llavamod_tpu.train.config import TrainConfig
    from llavamod_tpu.train.optim import TrainState
    from llavamod_tpu.train.sampler import ProcessShardSampler, RandomSampler
    from llavamod_tpu.train.steps import batch_from_arrays, make_align_step

    def tiny(moe):
        llm = tiny_config(num_layers=2, hidden_size=64,
                          intermediate_size=128, vocab_size=512)
        cfg = LlavaConfig(llm=llm, vision=tiny_vision_config(hidden_size=32),
                          projector_type="mlp2x_gelu", max_images=1)
        params = llava.init(cfg, jax.random.PRNGKey(0))
        if moe:
            mcfg, mp = upcycle(cfg.llm, params["llm"], moe_mode="sparse",
                               num_experts=2, top_k=1)
            cfg = cfg.replace(llm=mcfg.replace(moe_gating_group_size=32))
            params["llm"] = mp
        return cfg, params

    student_cfg, student_params = tiny(moe=True)
    teacher_cfg, teacher_params = tiny(moe=False)
    t_len, n_img = 32, student_cfg.num_image_tokens
    img_s = student_cfg.vision.image_size

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, expert=2, tensor=1))
    tcfg = TrainConfig(stage="align", align_loss_type="kd_lm",
                       optimizer="adamw", learning_rate=1e-3,
                       warmup_ratio=0.0, lr_schedule="constant",
                       compute_dtype="float32", remat=False,
                       vocab_chunk=256, total_steps=10)

    # the production data path: per-process strided shard of one global order
    n_data, g_batch, steps = 16, 4, 3
    rows_per_proc = g_batch // 2
    shards = [list(iter(ProcessShardSampler(RandomSampler(n_data, seed=11),
                                            r, 2))) for r in range(2)]

    def batches_for_step(b):
        """[(indices, global_rows)] per (virtual) process for step b."""
        out = []
        for r in range(2):
            idx = shards[r][b * rows_per_proc:(b + 1) * rows_per_proc]
            rows = [r * rows_per_proc + l for l in range(rows_per_proc)]
            out.append((idx, rows))
        return out

    multi = args.num_processes > 1

    def step_batch(b):
        per_proc = batches_for_step(b)
        if multi:
            idx, rows = per_proc[jax.process_index()]
            local = _local_batch(idx, rows, t_len, n_img, img_s)
            return shard_batch(mesh, local, multihost=True)
        # oracle: assemble the SAME global row order single-process
        idx = per_proc[0][0] + per_proc[1][0]
        rows = per_proc[0][1] + per_proc[1][1]
        return shard_batch(mesh, _local_batch(idx, rows, t_len, n_img,
                                              img_s), multihost=False)

    with jax.set_mesh(mesh):
        sp = shard_params(mesh, student_params)
        tp = shard_params(mesh, teacher_params)
        state = TrainState.create(sp, tcfg)
        step = make_align_step(student_cfg, teacher_cfg, tcfg)

        hist = []
        for b in range(steps):
            state, metrics = step(state, tp, batch_from_arrays(step_batch(b)))
            hist.append({k: float(v) for k, v in metrics.items()})

        # orbax save is collective across processes
        path = ckpt_mod.save_checkpoint(args.ckpt_dir, steps, state)

        # restore into a FRESH template (same seed => same shardings) and
        # take one more step from the restored state
        template = TrainState.create(shard_params(mesh, tiny(True)[1]), tcfg)
        restored = ckpt_mod.restore_checkpoint(path, template)
        _, r_metrics = step(restored, tp, batch_from_arrays(step_batch(0)))
        r_metrics = {k: float(v) for k, v in r_metrics.items()}

        leaves = [x for x in jax.tree_util.tree_leaves(state.params)
                  if jnp.issubdtype(x.dtype, jnp.floating)]
        checksum = float(jax.jit(lambda ls: sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in ls))(leaves))

    if not multi or jax.process_index() == 0:
        with open(args.out, "w") as fh:
            json.dump({"steps": hist, "restored": r_metrics,
                       "param_checksum": checksum,
                       "process_count": jax.process_count()}, fh)
    if multi:
        # let rank 0 finish writing before the cluster tears down
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
