from qgemm_tpu.parallel.mesh import make_mesh  # noqa: F401
from qgemm_tpu.parallel.sharding import (  # noqa: F401
    model_sharding_spec,
    shard_batch,
    shard_model,
)
