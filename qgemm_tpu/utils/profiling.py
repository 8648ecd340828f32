"""Wall-clock timing harness.

TPU analogue of the reference benchmark protocol (src/timing_quantize.cu:
27-34,106-113: 50 iterations, gettimeofday around cudaDeviceSynchronize,
report mean ms), corrected for how a remote-attached TPU actually behaves:

  * per-dispatch round-trip latency is tens of ms, so the iteration loop must
    live *inside* one jitted program (``lax.scan``), not in Python;
  * each iteration chains on the previous output through a zero-cost data
    dependency so iterations can't be deduplicated or reordered;
  * readback is a single scalar (full-array D2H through the tunnel is slow);
  * the fixed dispatch+RTT overhead is removed by differencing two iteration
    counts: ms = (T(iters) - T(base)) / (iters - base), min over repeats.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _timed_total(f, args, iters: int, repeats: int) -> float:
    """Best total seconds for `iters` chained applications of f."""
    x0 = args[0]
    rest = args[1:]

    @jax.jit
    def run(x):
        def step(c, _):
            out = f(c, *rest)
            # Chain a 1e-30-scaled reduction of EVERY output element into one
            # element of the carry: numerically nil, but (a) XLA cannot DCE
            # the computation, (b) cannot hoist the body as loop-invariant
            # (the carry provably changes), and (c) cannot shrink the op via
            # slice-of-dot rewrites (every element is consumed).
            dep = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            c2 = c.at[(0,) * c.ndim].add((dep * 1e-30).astype(c.dtype))
            return c2, None
        c, _ = jax.lax.scan(step, x, None, length=iters)
        return jnp.sum(c[..., :1].astype(jnp.float32))

    float(run(x0))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_ms(f, *args, iters: int = 400, base: int = 20, repeats: int = 4) -> float:
    """Mean wall-clock ms per call of ``f(*args)`` on device, overhead-free.

    ``f``'s first argument must be an array (used as the dependency carrier).
    """
    t_hi = _timed_total(f, args, iters, repeats)
    t_lo = _timed_total(f, args, base, repeats)
    return max(t_hi - t_lo, 1e-9) / (iters - base) * 1e3


def flops_per_sec(ms: float, flops: int) -> float:
    return flops / (ms * 1e-3)


class trace:
    """XLA/TPU profiler trace context (SURVEY.md §5 tracing equivalent:
    replaces the reference's gettimeofday pairs with real per-kernel HLO
    profiles viewable in TensorBoard/Perfetto)::

        with trace("/tmp/profile"):
            step(model, batch).block_until_ready()
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False
