"""RESIDUAL_MARGIN calibration from real checkpoint weights.

The banded DCN sampler's first dispatch assumes the offset head's learned
residual stays within RESIDUAL_MARGIN px of the guiding flow
(kernels/dcn_band.py:74 — currently grounded on random/scaled weights; a
violated margin costs one exact re-dispatch, never wrong output). The day
a released checkpoint (`E2FGVI-CVPR22.pth`, reference README.md:129) is
available, run:

    python scripts/calibrate_margin.py --ckpt E2FGVI-CVPR22.pth \
        --video /root/reference/examples/tennis \
        --mask  /root/reference/examples/tennis_mask

It inpaints the clip at serving settings, reads the pipeline's
last_band_stats telemetry (measured |flow_y| bound vs measured |offset_y|
bound — the gap IS the trained residual magnitude), prints the calibrated
margin, and persists it to results/band_calibration.json. Export
E2FGVI_DCN_RESIDUAL=<margin> (or bake it into the deployment env) to pin
the optimistic band policy to the measured value.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from e2fgvi_tpu.utils import env  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--model", choices=["e2fgvi", "e2fgvi_hq"],
                   default="e2fgvi")
    p.add_argument("--video", required=True,
                   help="frames dir or mp4 (a representative clip)")
    p.add_argument("--mask", required=True)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--out", default="results/band_calibration.json")
    args = p.parse_args()
    args.random_weights = False

    env.setup()
    import numpy as np
    import jax.numpy as jnp
    from e2fgvi_tpu.cli.inpaint import load_params
    from e2fgvi_tpu.data import readers
    from e2fgvi_tpu.data.pipeline import SlidingWindowInpainter
    from e2fgvi_tpu.models.e2fgvi import generator_forward

    size = (432, 240)
    frames = readers.read_frames(args.video, size)
    masks = readers.read_masks_from_dir(args.mask, size)
    orig = np.stack([np.asarray(f, np.uint8) for f in frames])
    binary = np.stack(masks)[..., None]

    params = load_params(args)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if dtype == jnp.bfloat16:
        import jax
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "astype") and x.dtype == jnp.float32 else x,
            params)
    runner = SlidingWindowInpainter(params, generator_forward,
                                    max_batch=8, dtype=dtype,
                                    out_dtype=np.uint8)
    runner(orig, binary.astype(np.float32), orig, binary)
    st = dict(runner.last_band_stats)
    if st.get("offset_bound") is None or st.get("flow_bound") is None:
        print("[calibrate] band policy did not run (XLA sampler path or "
              f"pinned band) — stats: {st}")
        return 1
    # trained residual = how far the learned offsets stray past the flow;
    # +1 px headroom for clip-to-clip variation
    residual = max(0.0, st["offset_bound"] - st["flow_bound"])
    margin = residual + 1.0
    st.update(measured_residual=residual, recommended_margin=margin,
              ckpt=args.ckpt, dtype=args.dtype)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(st, f, indent=1)
    print(json.dumps(st, indent=1))
    print(f"\nSet E2FGVI_DCN_RESIDUAL={margin:.1f} "
          f"(current default 4.0, kernels/dcn_band.py).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
