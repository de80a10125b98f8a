from llavamod_tpu.parallel.mesh import MeshConfig, make_mesh, AXES
from llavamod_tpu.parallel.sharding import (
    param_specs,
    batch_spec,
    shard_params,
    shard_batch,
)
