"""END-TO-END evaluate-protocol golden parity vs the torch reference.

The golden (tests/goldens/protocol_base.npz, produced by
scripts/make_protocol_golden.py) is the output of the ACTUAL reference
evaluate loop (evaluate.py:70-125: sliding windows, uint8 truncation,
composite with the 4x-dilated mask, stateful 50/50 overlap blend,
PSNR/SSIM on composites) run with deterministic weights on a
deterministic synthetic video. This test runs the JAX pipeline —
SlidingWindowInpainter (batched windows, validity masking, device-side
blend + sparse assembly) + eval.metrics — on the same video and asserts
the composites and metrics match, so a divergence in ANY pipeline stage
fails, not just the single-forward wiring that
tests/test_generator_golden.py pins.
"""

import ast
import os

import numpy as np
import pytest

from e2fgvi_tpu.convert.torch_loader import convert_generator
from e2fgvi_tpu.data.masks import dilate_cross
from e2fgvi_tpu.eval import metrics
from test_generator_golden import fill_weight

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "protocol_base.npz")


def synth_video(t, h, w):
    # keep in sync with scripts/make_protocol_golden.py (cv2 INTER_CUBIC
    # upsample of rng(13) low-res noise; moving-rectangle masks)
    import cv2
    rng = np.random.default_rng(13)
    low = rng.integers(0, 256, (t, h // 8, w // 8, 3)).astype(np.uint8)
    frames = np.stack([
        cv2.resize(f, (w, h), interpolation=cv2.INTER_CUBIC) for f in low])
    masks = np.zeros((t, h, w), np.uint8)
    for i in range(t):
        x0 = 40 + 9 * i
        y0 = 60 + 4 * i
        masks[i, y0: y0 + 70, x0: x0 + 90] = 1
    return frames, masks


@pytest.mark.slow
def test_evaluate_protocol_matches_reference_golden():
    import jax.numpy as jnp
    from e2fgvi_tpu.data.pipeline import SlidingWindowInpainter

    data = np.load(GOLDEN)
    keys = [str(k) for k in data["keys"]]
    shapes = [ast.literal_eval(str(s)) for s in data["shapes"]]
    t, h, w = int(data["t"]), int(data["h"]), int(data["w"])

    rng = np.random.default_rng(7)
    sd = {k: fill_weight(k, s, rng) for k, s in zip(keys, shapes)}
    params = convert_generator(sd, variant="base")

    frames_u8, masks_bin = synth_video(t, h, w)
    masks_dil = np.stack([dilate_cross(m) for m in masks_bin])[..., None]
    masks_dil = masks_dil.astype(np.float32)
    binary = masks_dil.astype(np.uint8)

    runner = SlidingWindowInpainter(params, max_batch=4,
                                    dtype=jnp.float32,
                                    out_dtype=np.float32)
    comp = np.stack(runner(frames_u8, masks_dil, frames_u8, binary))

    want = data["comp_slice"]
    got = comp[:, ::4, ::6, :]
    # composites are uint8-truncated window predictions blended with
    # dyadic-quarter weights; f32 forward divergence can flip a pixel
    # past a truncation boundary (one uint8 level, halved by the blend)
    diff = np.abs(got - want)
    assert diff.max() <= 1.0 + 1e-5, diff.max()
    assert (diff > 0.5).mean() < 5e-3, (diff > 0.5).mean()

    psnr, ssim = [], []
    for ori, c in zip(frames_u8, comp):
        p, s = metrics.calc_psnr_and_ssim(ori.astype(np.float64),
                                          c.astype(np.float64))
        psnr.append(p)
        ssim.append(s)
    np.testing.assert_allclose(psnr, data["psnr"], atol=0.02)
    np.testing.assert_allclose(ssim, data["ssim"], atol=2e-4)
