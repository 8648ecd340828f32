from qgemm_tpu.parallel.expert import (  # noqa: F401
    ep_moe_forward,
    shard_moe,
)
from qgemm_tpu.parallel.mesh import make_mesh  # noqa: F401
from qgemm_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_gpt_forward,
    stack_stages,
)
from qgemm_tpu.parallel.ring_attention import ring_attention  # noqa: F401
from qgemm_tpu.parallel.sharding import (  # noqa: F401
    model_sharding_spec,
    shard_batch,
    shard_kv_caches,
    shard_model,
    shard_quantized_model,
)
from qgemm_tpu.parallel.ulysses import ulysses_attention  # noqa: F401
