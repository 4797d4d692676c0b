"""Single-video inpainting CLI — the framework's `test.py` equivalent.

Mirrors the reference CLI contract (test.py:15-30): frame-directory or mp4
input, per-frame mask directory, E2FGVI / E2FGVI-HQ model selection,
neighbor/reference window knobs, and video output. Checkpoints are either
converted torch .pth files or orbax directories saved by this framework.

Usage:
  python -m e2fgvi_tpu.cli.inpaint -v examples/tennis -m examples/tennis_mask \
      -c E2FGVI-CVPR22.pth --model e2fgvi
"""

import argparse
import os
import time

import numpy as np

from e2fgvi_tpu.utils import env


def build_parser():
    p = argparse.ArgumentParser(description="E2FGVI-TPU video inpainting")
    p.add_argument("-v", "--video", type=str, required=True,
                   help="frame directory or .mp4")
    p.add_argument("-c", "--ckpt", type=str, required=True,
                   help=".pth (torch, converted on load) or orbax dir")
    p.add_argument("-m", "--mask", type=str, required=True,
                   help="directory of per-frame masks")
    p.add_argument("--model", type=str, default="e2fgvi",
                   choices=["e2fgvi", "e2fgvi_hq"])
    p.add_argument("--step", type=int, default=10, help="ref-frame stride")
    p.add_argument("--num_ref", type=int, default=-1)
    p.add_argument("--neighbor_stride", type=int, default=5)
    p.add_argument("--savefps", type=int, default=24)
    p.add_argument("--set_size", action="store_true", default=False)
    p.add_argument("--width", type=int)
    p.add_argument("--height", type=int)
    p.add_argument("--max_batch", type=int, default=4,
                   help="windows batched per device forward")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--out", type=str, default="results")
    p.add_argument("--random_weights", action="store_true",
                   help="smoke-test with random init instead of a ckpt")
    p.add_argument("--no_show", action="store_true",
                   help="skip the side-by-side result viewer")
    return p


def show_results(frames_pil, comp):
    """Side-by-side original/result animation (reference test.py:198-220).

    No-op in headless environments (Agg backend's plt.show does nothing)."""
    try:
        import matplotlib.pyplot as plt
        from matplotlib import animation
    except ImportError:
        return
    fig = plt.figure("Let us enjoy the result")
    ax1 = fig.add_subplot(1, 2, 1)
    ax1.axis("off")
    ax1.set_title("Original Video")
    ax2 = fig.add_subplot(1, 2, 2)
    ax2.axis("off")
    ax2.set_title("Our Result")
    imdata1 = ax1.imshow(frames_pil[0])
    imdata2 = ax2.imshow(np.asarray(comp[0], np.uint8))

    def update(idx):
        imdata1.set_data(frames_pil[idx])
        imdata2.set_data(np.asarray(comp[idx], np.uint8))

    fig.tight_layout()
    anim = animation.FuncAnimation(fig, update, frames=len(frames_pil),
                                   interval=50)
    plt.show()
    return anim


def load_params(args):
    from e2fgvi_tpu.models import e2fgvi as gen
    variant = "hq" if args.model == "e2fgvi_hq" else "base"
    if args.random_weights:
        import jax
        return gen.init_params(jax.random.PRNGKey(0), variant=variant)
    if args.ckpt.endswith((".pth", ".pt", ".ckpt")):
        from e2fgvi_tpu.convert import torch_loader
        return torch_loader.load_generator(args.ckpt, variant)
    from e2fgvi_tpu.utils import checkpoints
    return checkpoints.load_pytree(args.ckpt)


def main(argv=None):
    env.setup()
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    from e2fgvi_tpu.data import readers
    from e2fgvi_tpu.data.pipeline import SlidingWindowInpainter
    from e2fgvi_tpu.data.video import write_video
    from e2fgvi_tpu.models.e2fgvi import generator_forward

    if args.model == "e2fgvi":
        size = (432, 240)
    elif args.set_size:
        size = (args.width, args.height)
    else:
        size = None

    print(f"Loading frames from {args.video} ...")
    frames_pil = readers.read_frames(args.video, size)
    if size is None:
        size = frames_pil[0].size
    video_length = len(frames_pil)
    # uint8 straight through — the pipeline's fast path; the float frames
    # it would otherwise re-derive come from these exact bytes
    orig = np.stack([np.asarray(f, np.uint8) for f in frames_pil])
    frames = orig

    print(f"Loading masks from {args.mask} ...")
    mask_list = readers.read_masks_from_dir(args.mask, size)
    binary = np.stack(mask_list)[..., None]
    masks = binary.astype(np.float32)

    params = load_params(args)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    runner = SlidingWindowInpainter(
        params, generator_forward, neighbor_stride=args.neighbor_stride,
        ref_length=args.step, num_ref=args.num_ref,
        max_batch=args.max_batch, dtype=dtype, out_dtype=np.uint8)

    print(f"Inpainting {video_length} frames at {size[0]}x{size[1]} ...")
    t0 = time.time()
    comp = runner(frames, masks, orig, binary,
                  progress=lambda d, n: print(f"  windows {d}/{n}",
                                              end="\r"))
    dt = time.time() - t0
    print(f"\nDone in {dt:.2f}s ({video_length / dt:.2f} frames/s)")

    os.makedirs(args.out, exist_ok=True)
    base = os.path.basename(os.path.normpath(args.video))
    base = base.replace(".mp4", "") + "_results.mp4"
    out_path = write_video(os.path.join(args.out, base),
                           [np.asarray(c, np.uint8) for c in comp],
                           fps=args.savefps)
    print(f"Saved: {out_path}")
    if not args.no_show:
        show_results(frames_pil, comp)
    return out_path


if __name__ == "__main__":
    main()
