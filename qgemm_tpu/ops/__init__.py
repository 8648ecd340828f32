from qgemm_tpu.ops import elemwise, reduction  # noqa: F401
from qgemm_tpu.ops.softmax import softmax  # noqa: F401
from qgemm_tpu.ops.layernorm import layernorm, layernorm_residual  # noqa: F401
from qgemm_tpu.ops.cross_entropy import cross_entropy_loss  # noqa: F401
from qgemm_tpu.ops.matmul import matmul  # noqa: F401
from qgemm_tpu.ops.quantize import (  # noqa: F401
    absmax_quantize,
    dequantize,
    quantized_matmul,
    quantized_matmul_outlier,
)
