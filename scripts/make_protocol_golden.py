"""Generate an END-TO-END evaluate-protocol golden from the torch reference.

The whole-generator golden (tests/test_generator_golden.py) pins one
forward pass; nothing pinned the full *evaluate protocol* — sliding
windows (evaluate.py:82-89), per-window masking, uint8 truncation,
composite with the 4x-dilated mask, and the stateful 50/50 overlap blend
(evaluate.py:96-106) — end-to-end. This script runs the ACTUAL reference
loop (re-enacted verbatim from /root/reference/evaluate.py:70-125, model
executed under tests/mmcv_shim.py) on a deterministic synthetic video
with deterministic weights, and stores:

  - strided slices of every composited frame (f32, post-blend),
  - per-frame PSNR and SSIM of comp vs original, computed with
    e2fgvi_tpu.eval.metrics (itself pinned against a literal brute-force
    oracle in tests/test_metrics.py, skimage-0.16 semantics, win 65).

tests/test_protocol_golden.py then rebuilds the same weights without
torch, runs the JAX SlidingWindowInpainter + metrics on the same video,
and must reproduce these numbers — so a divergence in ANY pipeline stage
(window planning, batching, validity masking, device-side blend,
composite, sparse assembly, metric) fails, not just a model-math one.

Weight protocol = scripts/make_golden.py (rng(7), fan-in scaled).
Input protocol: frames are rng(13) uint8 smoothed noise (8x-upsampled
low-res noise — bounded, image-like gradients); masks are a moving
rectangle binarized and cv2-dilated exactly like the reference
TestDataset (core/dataset.py:124-128).

Run (one-time, needs /root/reference): PYTHONPATH=. python scripts/make_protocol_golden.py
"""

import os
import sys
import time

import cv2
import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import mmcv_shim  # noqa: E402

mmcv_shim.install()
sys.path.insert(0, "/root/reference")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from e2fgvi_tpu.eval import metrics  # noqa: E402
from make_golden import fill_weight  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

H, W, T = 240, 432, 12
NEIGHBOR_STRIDE, REF_LENGTH = 5, 10


def synth_video():
    """Deterministic frames (uint8) + undilated masks (uint8 {0,1})."""
    rng = np.random.default_rng(13)
    low = rng.integers(0, 256, (T, H // 8, W // 8, 3)).astype(np.uint8)
    frames = np.stack([
        cv2.resize(f, (W, H), interpolation=cv2.INTER_CUBIC) for f in low])
    masks = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        x0 = 40 + 9 * t
        y0 = 60 + 4 * t
        masks[t, y0: y0 + 70, x0: x0 + 90] = 1
    return frames, masks


def dilated(masks):
    kernel = cv2.getStructuringElement(cv2.MORPH_CROSS, (3, 3))
    return np.stack([cv2.dilate(m, kernel, iterations=4) for m in masks])


def get_ref_index(neighbor_ids, length):
    # reference evaluate.py:23-28
    return [i for i in range(0, length, REF_LENGTH)
            if i not in neighbor_ids]


def main():
    from model.e2fgvi import InpaintGenerator

    model = InpaintGenerator(init_weights=False).eval()
    keys = sorted(k for k, _ in model.named_parameters())
    shapes = [tuple(dict(model.named_parameters())[k].shape) for k in keys]
    rng = np.random.default_rng(7)
    sd = {k: torch.from_numpy(fill_weight(k, s, rng))
          for k, s in zip(keys, shapes)}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    for m in missing:
        assert "valid_ind" in m or m.endswith(("mean", "std")), m

    frames_u8, masks_bin = synth_video()
    masks_dil = dilated(masks_bin)          # the TestDataset mask output

    # reference evaluate.py:70-125 re-enacted verbatim
    frames = torch.from_numpy(
        frames_u8.astype(np.float32) / 255.0 * 2 - 1).permute(0, 3, 1, 2)
    masks = torch.from_numpy(masks_dil.astype(np.float32))[:, None]
    ori_frames = [f for f in frames_u8]
    comp_frames = [None] * T

    for f in range(0, T, NEIGHBOR_STRIDE):
        neighbor_ids = list(range(max(0, f - NEIGHBOR_STRIDE),
                                  min(T, f + NEIGHBOR_STRIDE + 1)))
        ref_ids = get_ref_index(neighbor_ids, T)
        ids = neighbor_ids + ref_ids
        selected_imgs = frames[None, ids]
        selected_masks = masks[None, ids]
        t0 = time.time()
        with torch.no_grad():
            masked_frames = selected_imgs * (1 - selected_masks)
            pred_img, _ = model(masked_frames, len(neighbor_ids))
            pred_img = (pred_img + 1) / 2
            pred_img = pred_img.cpu().permute(0, 2, 3, 1).numpy() * 255
        print(f"window f={f}: T={len(ids)} forward "
              f"{time.time() - t0:.1f}s", flush=True)
        binary_masks = masks_dil[neighbor_ids][..., None]
        for i, idx in enumerate(neighbor_ids):
            img = np.array(pred_img[i]).astype(np.uint8) * binary_masks[i] \
                + ori_frames[idx] * (1 - binary_masks[i])
            if comp_frames[idx] is None:
                comp_frames[idx] = img
            else:
                comp_frames[idx] = comp_frames[idx].astype(np.float32) \
                    * 0.5 + img.astype(np.float32) * 0.5

    comp = np.stack([c.astype(np.float32) for c in comp_frames])
    psnr, ssim = [], []
    for ori, c in zip(ori_frames, comp):
        p, s = metrics.calc_psnr_and_ssim(ori.astype(np.float64),
                                          c.astype(np.float64))
        psnr.append(p)
        ssim.append(s)
    print("PSNR", np.round(psnr, 3))
    print("SSIM", np.round(ssim, 5))

    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "protocol_base.npz")
    np.savez_compressed(
        path,
        keys=np.array(keys), shapes=np.array([str(s) for s in shapes]),
        t=T, h=H, w=W,
        comp_slice=comp[:, ::4, ::6, :],
        psnr=np.asarray(psnr), ssim=np.asarray(ssim),
    )
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
