"""qgemm_tpu — a TPU-native int8 quantized-GEMM transformer inference framework.

A brand-new JAX / XLA / Pallas implementation of the capability surface of
``ritikasaboo13/Quantized-GEMM-for-Transformer-Inference`` (the "BareNet" CUDA
lab project): LLM.int8()-style absmax vector-wise int8 quantization fused into
MXU matmuls, with the surrounding op library (elementwise / reduction /
softmax / layernorm / cross-entropy), NN modules (Linear / Attention / MLP)
with training support (SGD), an MNIST MLP workload, and full encoder-decoder
transformer inference with a KV-cache — re-designed TPU-first and scaled out
over a ``jax.sharding.Mesh`` (tensor/data parallel) rather than ported.

Layer map (mirrors SURVEY.md §1 of the reference, idiomatically):
  - ``qgemm_tpu.ops``      — stateless tensor ops (jnp reference + Pallas kernels)
  - ``qgemm_tpu.models``   — pytree NN modules, optimizer, transformer
  - ``qgemm_tpu.parallel`` — mesh / sharding / tensor parallelism
  - ``qgemm_tpu.utils``    — config, PRNG plumbing, testing, profiling
  - ``qgemm_tpu.data``     — MNIST idx pipeline (C++ fast path + numpy fallback)
"""

__version__ = "0.1.0"

from qgemm_tpu.ops.quantize import (  # noqa: F401
    absmax_quantize,
    dequantize,
    quantized_matmul,
    quantized_matmul_outlier,
)
