from qgemm_tpu.models.linear import Linear, QuantizedLinear  # noqa: F401
from qgemm_tpu.models.attention import Attention, MultiHeadAttention  # noqa: F401
from qgemm_tpu.models.mlp import MLP  # noqa: F401
from qgemm_tpu.models.optim import SGD, sgd_step  # noqa: F401
