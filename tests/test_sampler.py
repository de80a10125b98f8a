"""Modality-grouped length sampler tests (reference llava_trainer.py:40-132
semantics, VERDICT round-1 missing #5)."""

import numpy as np
import pytest

from llavamod_tpu.train.sampler import (
    LengthGroupedSampler,
    RandomSampler,
    get_length_grouped_indices,
    get_modality_length_grouped_indices,
    split_to_even_chunks,
)


def test_split_to_even_chunks_balances_totals():
    lengths = [10, 9, 8, 1, 1, 1]
    chunks = split_to_even_chunks(list(range(6)), lengths, 2)
    assert sorted(i for c in chunks for i in c) == list(range(6))
    totals = [sum(lengths[i] for i in c) for c in chunks]
    assert max(totals) - min(totals) <= 9  # greedy shortest-chunk assignment
    assert all(len(c) == 3 for c in chunks)


def test_split_to_even_chunks_ragged_strides():
    # non-divisible: falls back to strided split (llava_trainer.py:45-46)
    chunks = split_to_even_chunks([0, 1, 2, 3, 4], [1] * 5, 2)
    assert chunks == [[0, 2, 4], [1, 3]]


def test_length_grouped_indices_sorted_within_megabatch():
    rng = np.random.default_rng(0)
    lengths = list(rng.integers(1, 100, size=32))
    idx = get_length_grouped_indices(lengths, batch_size=4, world_size=2,
                                     rng=np.random.default_rng(1))
    assert sorted(idx) == list(range(32))
    # within each world-chunk of a megabatch, lengths lean long-first
    mb = 8
    first = idx[:mb]
    assert max(lengths[i] for i in first) >= np.median(
        [lengths[i] for i in idx])


def test_modality_grouping_keeps_modalities_together():
    # positives = multimodal, negatives = text-only
    lengths = [10, 12, 9, 11, -5, -6, -4, -7] * 2
    idx = get_modality_length_grouped_indices(
        lengths, batch_size=2, world_size=2, rng=np.random.default_rng(0))
    assert sorted(idx) == list(range(16))
    mb = 4
    mixed = [len({lengths[j] > 0 for j in idx[i:i + mb]}) > 1
             for i in range(0, len(idx) - mb + 1, mb)]
    # the last megabatch of each modality merges into one trailing
    # "additional batch" (llava_trainer.py:79-88) — only that tail (here
    # 2 windows) may mix; every leading megabatch is single-modality
    assert not any(mixed[:-2]), mixed


def test_modality_grouping_single_modality_falls_back():
    lengths = [3, 4, 5, 6]
    idx = get_modality_length_grouped_indices(
        lengths, 2, 1, rng=np.random.default_rng(0))
    assert sorted(idx) == [0, 1, 2, 3]


def test_sampler_epoch_reshuffles():
    s = LengthGroupedSampler(2, 1, [5, -3, 8, -2, 7, 6, -9, 4],
                             group_by_modality=True, seed=0)
    s.set_epoch(0)
    a = list(iter(s))
    s.set_epoch(1)
    b = list(iter(s))
    assert sorted(a) == sorted(b) == list(range(8))
    assert a != b

    r = RandomSampler(16, seed=0)
    r.set_epoch(0)
    a = list(iter(r))
    r.set_epoch(3)
    assert a != list(iter(r))


def test_config_json_fills_defaults_only(tmp_path):
    """--config JSON provides defaults; explicit CLI flags win."""
    import json

    from llavamod_tpu.train.args import (
        DataArgs,
        ModelArgs,
        TrainArgs,
        parse_into_dataclasses,
    )

    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({"learning_rate": 5e-4, "model_max_length": 512,
                               "version": "v1"}))
    margs, dargs, targs = parse_into_dataclasses(
        [ModelArgs, DataArgs, TrainArgs],
        ["--config", str(cfg), "--model_max_length", "1024"])
    assert targs.learning_rate == 5e-4          # from config
    assert targs.model_max_length == 1024       # CLI override wins
    assert margs.version == "v1"


def test_lr_schedule_counts_optimizer_steps():
    from llavamod_tpu.train.args import TrainArgs, train_config_from_args

    targs = TrainArgs(gradient_accumulation_steps=8)
    tcfg = train_config_from_args("align", targs, total_steps=800)
    assert tcfg.total_steps == 100  # micro steps / accum
