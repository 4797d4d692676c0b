"""720p HQ benchmark (BASELINE config #5: high-res long-video serving).

Runs the HQ (arbitrary-resolution) model end-to-end through the sliding
-window pipeline at 1280x720 — tennis frames upscaled (real flow
statistics), masks upscaled nearest — with random weights (no released
checkpoints in this environment; SPyNet residuals tamed exactly like
bench.py so the flow magnitudes match a trained model's).

At 720p the quarter-res width (320) spans three 128-lane tiles — the
banded sampler covers it via the multi-tile gather (r05,
kernels/dcn_band.py); a compile failure there falls back to the exact
XLA sampler automatically (pipeline dispatch_with_fallback).
E2FGVI_BENCH_BATCH bounds the window batch (default 2).

Writes ONE JSON line + results/bench_720p_r05.json.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/bench_720p.py
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")

from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SIZE = (1280, 720)
N_FRAMES = int(os.environ.get("E2FGVI_720_FRAMES", "20"))


def load_video():
    import cv2
    ex = "/root/reference/examples"
    if os.path.isdir(os.path.join(ex, "tennis")):
        from e2fgvi_tpu.data import readers
        frames_pil = readers.read_frames_from_dir(
            os.path.join(ex, "tennis"), None)[:N_FRAMES]
        masks = readers.read_masks_from_dir(
            os.path.join(ex, "tennis_mask"), None)[:N_FRAMES]
        frames = np.stack([
            cv2.resize(np.asarray(f, np.uint8), SIZE,
                       interpolation=cv2.INTER_CUBIC) for f in frames_pil])
        masks = np.stack([
            cv2.resize(m, SIZE, interpolation=cv2.INTER_NEAREST)
            for m in masks])[..., None]
        return frames, masks.astype(np.float32)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (N_FRAMES, SIZE[1], SIZE[0], 3),
                          dtype=np.uint8)
    masks = np.zeros((N_FRAMES, SIZE[1], SIZE[0], 1), np.float32)
    masks[:, 180:360, 320:640] = 1
    return frames, masks


def main():
    from e2fgvi_tpu.data.pipeline import SlidingWindowInpainter
    from e2fgvi_tpu.models import e2fgvi

    frames, masks = load_video()
    n = frames.shape[0]
    params = e2fgvi.init_params(jax.random.PRNGKey(0), variant="hq")
    for mod in params["spynet"]["modules"]:
        last = sorted(mod)[-1]
        mod[last]["w"] = mod[last]["w"] * 0.05
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "astype") and x.dtype == jnp.float32 else x, params)

    runner = SlidingWindowInpainter(
        params, e2fgvi.generator_forward,
        max_batch=int(os.environ.get("E2FGVI_BENCH_BATCH", "2")),
        dtype=jnp.bfloat16, out_dtype=np.uint8)
    binary = masks.astype(np.uint8)

    # warm (compile) pass, then timed pass
    comp = runner(frames, masks, frames, binary)
    assert len(comp) == n and comp[0].shape == (SIZE[1], SIZE[0], 3)
    t0 = time.time()
    comp = runner(frames, masks, frames, binary)
    dt = time.time() - t0
    fps = n / dt
    line = {
        "metric": "frames_per_sec_1280x720_hq", "value": round(fps, 3),
        "unit": "frames/s", "n_frames": n,
        "seconds_per_video": round(dt, 3),
        "max_batch": runner.max_batch,
        "band_stats": getattr(runner, "last_band_stats", None),
        "marks_ms": {k: round(1e3 * v) for k, v in
                     getattr(runner, "last_marks", {}).items()},
    }
    print(json.dumps(line), flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/bench_720p_r05.json", "w") as f:
        json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
