"""Process-level JAX configuration helpers.

Call `setup()` once at entry-point start (CLIs, tests, bench). It:

- enables the persistent compilation cache (first-compile on this class of
  host is extremely slow; the cache amortizes it across processes),
- pins default matmul/conv precision to 'highest'. This matters for parity:
  jax's DEFAULT precision runs f32 matmuls through bf16 passes (on TPU *and*
  on this CPU backend), which costs ~2e-3 relative error per GEMM — enough to
  shift PSNR. Speed paths opt into bf16 explicitly by casting inputs (dtype
  beats precision: bf16 inputs run single-pass on the MXU).
"""

import os

import jax

_DONE = False


def setup(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    if cache_dir is None:
        cache_dir = os.environ.get(
            "E2FGVI_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without persistent cache knobs
    precision = os.environ.get("E2FGVI_MATMUL_PRECISION", "highest")
    jax.config.update("jax_default_matmul_precision", precision)
    # honor JAX_PLATFORMS even when a PJRT plugin force-prepends itself
    # (the axon plugin does): the env var alone is consulted before
    # plugin registration, so re-pin via the config knob. Without this,
    # JAX_PLATFORMS=cpu CLI runs still try the (possibly unreachable)
    # tunnel-attached device and hang at init.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
