"""Config / flag system.

The reference uses getopt short flags ``-s`` (seed), ``-c`` (CPU), ``-m/-n/-k``
(GEMM dims) (src/test_quantize.cu:94-117, src/timing_quantize.cu:82-103) and
hard-coded model hyperparameters (src/transformer.cu:171-178). Here both
become dataclasses with an argparse bridge that accepts the same short flags.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass


@dataclass
class GemmConfig:
    m: int = 2048
    n: int = 2048
    k: int = 2048
    seed: int = 0
    on_cpu: bool = False  # reference's -c escape hatch -> force jax cpu backend
    iters: int = 50       # reference benchmark protocol: 50 iterations


@dataclass
class TransformerConfig:
    """Hyperparameters of the encoder-decoder demo (src/transformer.cu:170-185:
    seq=6, d_model=8, heads=4, blocks=2, d_ff=8) — generalized."""

    vocab_size: int = 32000
    d_model: int = 512
    n_heads: int = 8
    d_ff: int = 2048
    n_layers: int = 2
    max_seq_len: int = 512
    dtype: str = "bfloat16"
    quantized: bool = True          # route every GEMM through int8 path
    outlier_threshold: float = 0.0  # 0 disables outlier decomposition
    outlier_capacity: int = 0       # static #outlier feature dims (jit-friendly)


def add_gemm_flags(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("-c", "--cpu", action="store_true", help="run on CPU backend")
    p.add_argument("-m", type=int, default=2048)
    p.add_argument("-n", type=int, default=2048)
    p.add_argument("-k", type=int, default=2048)
    p.add_argument("--iters", type=int, default=50)
    return p


def gemm_config_from_args(args) -> GemmConfig:
    return GemmConfig(m=args.m, n=args.n, k=args.k, seed=args.seed,
                      on_cpu=args.cpu, iters=args.iters)


def asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)
