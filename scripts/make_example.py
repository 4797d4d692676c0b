#!/usr/bin/env python
"""Generate a small self-contained example (moving-shapes video + masks).

Creates examples/<name>/ (frame PNGs) and examples/<name>_mask/ (per-frame
masks) so the inpaint CLI can be smoke-tested without external data, plus —
with --dataset — a davis-layout mini test dataset (zipped JPEGs +
test_masks + test.json) for the evaluate CLI.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import os
import zipfile

import numpy as np
from PIL import Image

from e2fgvi_tpu.data.masks import create_random_shape_with_random_motion


def synth_video(t, w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    phase = rng.uniform(0, 6.28, 3)
    for i in range(t):
        r = 127 + 100 * np.sin(xx / 37 + i * 0.21 + phase[0])
        g = 127 + 100 * np.sin(yy / 23 - i * 0.13 + phase[1])
        b = 127 + 100 * np.sin((xx + yy) / 53 + i * 0.08 + phase[2])
        # a moving square "object"
        cx = int(w * 0.2 + (w * 0.6) * (i / max(t - 1, 1)))
        cy = h // 2 + int(h * 0.2 * np.sin(i * 0.4))
        img = np.stack([r, g, b], -1)
        img[max(0, cy - 12): cy + 12, max(0, cx - 12): cx + 12] = [230, 40,
                                                                   40]
        frames.append(img.clip(0, 255).astype(np.uint8))
    return frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="examples")
    p.add_argument("--name", default="synthetic")
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--dataset", action="store_true",
                   help="also emit a davis-layout mini dataset")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    frames = synth_video(args.frames, args.width, args.height, args.seed)
    masks = create_random_shape_with_random_motion(
        args.frames, image_height=args.height, image_width=args.width,
        seed=args.seed)

    fdir = os.path.join(args.out, args.name)
    mdir = os.path.join(args.out, f"{args.name}_mask")
    os.makedirs(fdir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)
    for i, (f, m) in enumerate(zip(frames, masks)):
        Image.fromarray(f).save(os.path.join(fdir, f"{i:05d}.png"))
        m.save(os.path.join(mdir, f"{i:05d}.png"))
    print(f"wrote {args.frames} frames to {fdir} and masks to {mdir}")

    if args.dataset:
        import json
        root = os.path.join(args.out, f"{args.name}_davis", "davis")
        os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
        mask_root = os.path.join(root, "test_masks", args.name)
        os.makedirs(mask_root, exist_ok=True)
        zpath = os.path.join(root, "JPEGImages", f"{args.name}.zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            for i, f in enumerate(frames):
                tmp = os.path.join(fdir, f"{i:05d}.png")
                zf.write(tmp, arcname=f"{i:05d}.png")
        for i, m in enumerate(masks):
            m.save(os.path.join(mask_root, f"{i:05d}.png"))
        with open(os.path.join(root, "test.json"), "w") as f:
            json.dump({args.name: args.frames}, f)
        print(f"wrote mini davis dataset under {root}")


if __name__ == "__main__":
    main()
