"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-chip sharding is validated via
``--xla_force_host_platform_device_count`` so CI never needs a pod; Pallas
kernels detect the CPU backend and run in interpreter mode.

NOTE: the environment may pre-import jax through sitecustomize (remote-TPU
boot hook), so env vars alone are too late — we must also flip
``jax_platforms`` through the config API before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
