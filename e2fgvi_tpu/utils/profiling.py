"""Profiling utilities that survive this box's axon TPU tunnel.

Two quirks make naive timing wrong here (measured, see README perf notes):
- `jax.block_until_ready` does NOT wait for device execution on the axon
  backend — a scalar readback (`np.asarray`) is the only reliable fence;
- every device->host readback costs a ~28 ms tunnel round trip, so per-call
  timings must amortize many dispatched calls over ONE readback.

`time_stage` dispatches `iters` executions of a jitted stage back-to-back
(single-device program order serializes them), fences once, and subtracts
the tunnel latency. `trace` wraps `jax.profiler.trace` when the backend
supports it (falls back to a no-op on the tunneled device).
"""

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp

TUNNEL_LATENCY_S = 0.028


def _fence(out):
    leaves = jax.tree.leaves(out)
    np.asarray(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def time_stage(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Seconds per call of `fn(*args)` (jitted), tunnel-corrected."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    return max((time.time() - t0 - TUNNEL_LATENCY_S) / iters, 0.0)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler device trace; silently degrades if unsupported."""
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:  # tunneled backend may not support profiling
        yield
