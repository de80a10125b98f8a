"""Device mesh construction.

The reference scales with DeepSpeed ZeRO (data parallel) + DeepSpeed-MoE
expert parallel over NCCL (SURVEY.md §2.10).  Here all parallelism is one
`jax.sharding.Mesh` with four logical axes:

  pipe   — pipeline parallelism (GPipe microbatch schedule over the
           period-stacked layer repeats; parallel/pipeline.py)
  data   — batch data parallelism (ZeRO-equivalent grad sync via psum)
  fsdp   — parameter/optimizer sharding (ZeRO-3-equivalent, riding ICI)
  expert — expert parallelism for MoE layers (GSPMD emits the all-to-all)
  tensor — tensor parallelism (attention heads / FFN hidden / vocab)

The reference has no TP/PP (builder.py:382-383 comments out mp_size); TP
and PP come for free here.  Sequence parallelism (also absent upstream,
SURVEY §2.10) rides the SAME 'tensor' axis: DecoderConfig.
seq_shard_activations constrains the residual stream to be T-sharded
between blocks and GSPMD emits the Megatron-SP all-gather/reduce-scatter
pairs around the TP matmuls.  Axis order: 'pipe' is outermost — its
traffic is one point-to-point activation transfer per pipeline tick, the
cheapest to put on DCN in a multi-slice deployment; 'data' next (one grad
all-reduce per step); the ICI-hungry axes innermost/fastest.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("pipe", "data", "fsdp", "expert", "tensor")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = 1
    expert: int = 1
    tensor: int = 1
    pipe: int = 1

    @property
    def size(self) -> int:
        return self.data * self.fsdp * self.expert * self.tensor * self.pipe

    @classmethod
    def auto(cls, n_devices: Optional[int] = None, *, expert: int = 1,
             tensor: int = 1) -> "MeshConfig":
        """All remaining devices go to fsdp (the usual single-slice choice)."""
        n = n_devices or jax.device_count()
        assert n % (expert * tensor) == 0
        return cls(data=1, fsdp=n // (expert * tensor), expert=expert,
                   tensor=tensor)


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg or MeshConfig.auto(len(devices))
    assert cfg.size == len(devices), (
        f"mesh {cfg} needs {cfg.size} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(cfg.pipe, cfg.data, cfg.fsdp,
                                      cfg.expert, cfg.tensor)
    return Mesh(arr, AXES)
