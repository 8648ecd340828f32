"""Device mesh construction.

Greenfield component (the reference is single-GPU with no communication
backend — SURVEY.md §2). Axes follow the BASELINE north star:
``data`` (batch / per-host) x ``model`` (tensor sharding over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data", "model"),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default shape: all devices on ``model`` (tensor parallelism inside one
    slice rides ICI; add a leading data dim for multi-host DP).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n) if len(axis_names) == 2 else (n,)
    total = int(np.prod(shape))
    if total > n:
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {n}")
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host bring-up: ``jax.distributed.initialize`` over DCN.
    No-op when running single-process (the common dev path)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
