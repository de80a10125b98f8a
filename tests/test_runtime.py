"""Runtime prefetcher tests."""

import numpy as np

import jax

from llavamod_tpu.parallel.mesh import MeshConfig, make_mesh
from llavamod_tpu.runtime.prefetch import DevicePrefetcher


def _batches(n):
    for i in range(n):
        yield {"x": np.full((4, 8), i, np.float32), "i": np.array(i)}


def test_prefetcher_yields_all_in_order_on_device():
    out = list(DevicePrefetcher(_batches(5), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert int(b["i"]) == i
        assert isinstance(b["x"], jax.Array)


def test_prefetcher_shards_on_mesh():
    mesh = make_mesh(MeshConfig(data=2, fsdp=4))

    def batches():
        for i in range(3):
            yield {"x": np.full((8, 8), i, np.float32), "i": np.array(i)}

    out = list(DevicePrefetcher(batches(), mesh=mesh, depth=2))
    assert len(out) == 3
    # batch dim sharded over (data, fsdp)
    assert len(out[0]["x"].sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in out[0]["x"].addressable_shards}
    assert shard_shapes == {(1, 8)}


def test_prefetcher_depth_one_and_empty():
    assert list(DevicePrefetcher(_batches(0))) == []
    assert len(list(DevicePrefetcher(_batches(2), depth=1))) == 2
