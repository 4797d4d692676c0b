"""A/B the banded sampler's span-fast path (E2FGVI_DCN_SPAN) on TPU.

The block sweep pays >=1 full 8-row block per strip (2 on straddle);
span-fast sweeps exactly [lo, lo+span) rows from a dynamic-start slab
when the strip's measured span fits. The win depends entirely on the
offset field's smoothness, so this harness times BOTH regimes:

- "smooth": low-frequency sinusoidal flow (amp ~4 px) + small smooth
  residual — the shape SPyNet produces on real video (the serving case;
  strip spans ~2-4 rows).
- "noise": per-pixel N(0,3) offsets — worst case; spans blow past any
  span bucket, the fast path never fires, measuring pure gate overhead.

Each timed variant is also checked exactly-equal (bf16) / allclose (f32)
against span=0 on-device before timing.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_span_r05.py
"""

import functools
import os
import sys

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, H, W, C = 14, 60, 108, 128
G, K = 16, 9
DT = jnp.bfloat16
BAND = 24


def smooth_field(rng, shape, amp, noise=0.25):
    """Low-frequency sinusoid + small noise, |field| <~ amp."""
    n, h, w = shape[:3]
    y = np.linspace(0, 2 * np.pi, h)[None, :, None]
    x = np.linspace(0, 2 * np.pi, w)[None, None, :]
    ph = rng.uniform(0, 2 * np.pi, (n, 1, 1, 2))
    base = np.stack([np.sin(y * rng.uniform(0.5, 1.5) + ph[..., 0])
                     * np.cos(x * rng.uniform(0.5, 1.5)),
                     np.cos(y * rng.uniform(0.5, 1.5))
                     * np.sin(x * rng.uniform(0.5, 1.5) + ph[..., 1])],
                    axis=-1)
    return (amp * base
            + rng.standard_normal(shape[:3] + (2,)) * noise
            ).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((B, H, W, 2 * C)), DT)
    feat = jnp.asarray(rng.standard_normal((2 * B, H, W, C)), DT)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 2 * C, C)) * 0.05, DT)
    bias = jnp.zeros((C,), DT)
    mask = jnp.asarray(rng.uniform(0, 1, (B, H, W, G, K)), jnp.float32)

    flows = {
        "smooth": smooth_field(rng, (B, H, W), amp=4.0),
        "noise": rng.standard_normal((B, H, W, 2)).astype(np.float32) * 3,
    }

    from e2fgvi_tpu.kernels.dcn_band import (
        flow_warp_banded, modulated_deform_conv2d_banded)

    for regime, fl in flows.items():
        # DCN offsets = flow (dy,dx swapped) + smooth residual per (g,k)
        res = (smooth_field(rng, (B, H, W), amp=1.5, noise=0.2)
               [:, :, :, None, None, :]
               + rng.standard_normal((B, H, W, G, K, 2)).astype(
                   np.float32) * 0.15)
        if regime == "noise":
            res = rng.standard_normal((B, H, W, G, K, 2)).astype(
                np.float32) * 3
        offsets = jnp.asarray(fl[..., ::-1][:, :, :, None, None, :] + res)
        offsets = jnp.clip(offsets, -8, 8)
        flow2 = jnp.asarray(np.concatenate([fl, fl], 0))

        ref_d = ref_w = None
        for span in (0, 2, 4, 8):
            dcn = jax.jit(functools.partial(
                modulated_deform_conv2d_banded, band=BAND, light=False,
                span=span))
            wrp = jax.jit(functools.partial(
                flow_warp_banded, band=BAND, light=False, span=span))
            try:
                out_d = np.asarray(dcn(x2, offsets, mask, wgt, bias)
                                   ).astype(np.float32)
                out_w = np.asarray(wrp(feat, flow2)).astype(np.float32)
                if span == 0:
                    ref_d, ref_w = out_d, out_w
                else:
                    np.testing.assert_allclose(out_d, ref_d, rtol=2e-2,
                                               atol=2e-2)
                    np.testing.assert_array_equal(out_w, ref_w)
                td = time_stage(dcn, x2, offsets, mask, wgt, bias, iters=8)
                tw = time_stage(wrp, feat, flow2, iters=8)
                print(f"{regime:7s} span={span}  dcn {td * 1e3:7.2f} ms"
                      f"   warp(2x{C}ch) {tw * 1e3:7.2f} ms", flush=True)
            except Exception as e:  # compile failure -> report, continue
                print(f"{regime:7s} span={span}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
