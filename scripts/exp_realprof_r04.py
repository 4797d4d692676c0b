"""Profile feat_prop / window stages on the REAL bench inputs (r04).

profile_forward.py feeds i.i.d. N(0,2) flows into feat_prop; the actual
bench offsets are the SPyNet flows themselves (the offset head is
zero-initialized per the reference init_offset, feat_prop.py:32-33), which
are spatially smooth — so the banded sampler's per-strip row bounds may
sweep far fewer rows than the synthetic profile suggests. This script
reproduces the bench's stage-3 inputs exactly (tennis frames -> masked ->
encode -> SPyNet pair flows -> window gather at the uniform geometry) and
times feat_prop / the transformer / the full window stage on them, plus
reports the banded sampler's measured per-strip row spans.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_realprof_r04.py
"""

import os

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")

from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.models import e2fgvi  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

SIZE = (432, 240)
DTYPE = jnp.bfloat16


def load_video():
    ex = "/root/reference/examples"
    if os.path.isdir(os.path.join(ex, "tennis")):
        from e2fgvi_tpu.data import readers
        frames_pil = readers.read_frames_from_dir(
            os.path.join(ex, "tennis"), SIZE)
        masks = readers.read_masks_from_dir(
            os.path.join(ex, "tennis_mask"), SIZE)
        orig = np.stack([np.asarray(f, np.uint8) for f in frames_pil])
        return orig, np.stack(masks)[..., None].astype(np.float32)
    rng = np.random.default_rng(0)
    orig = rng.integers(0, 256, (70, SIZE[1], SIZE[0], 3), np.uint8)
    masks = np.zeros((70, SIZE[1], SIZE[0], 1), np.float32)
    masks[:, 60:120, 108:216] = 1
    return orig, masks


def main():
    from e2fgvi_tpu.data import pipeline as pl_mod

    frames, masks = load_video()
    t_video = frames.shape[0]
    # exactly the bench's model state (bench.py:74-91) incl. the SPyNet
    # residual taming to real-checkpoint flow magnitudes
    params = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
    for mod in params["spynet"]["modules"]:
        last = sorted(mod)[-1]
        mod[last]["w"] = mod[last]["w"] * 0.05
    params = jax.tree.map(
        lambda x: x.astype(DTYPE)
        if hasattr(x, "astype") and x.dtype == jnp.float32 else x, params)

    # stage 1+2 exactly as the pipeline runs them
    f = jnp.asarray(frames, jnp.float32) / 255.0 * 2.0 - 1.0
    m = jnp.asarray(masks)
    masked = (f * (1.0 - m)).astype(DTYPE)
    feat_all = jax.jit(e2fgvi.encode)(params["encoder"], masked)
    from e2fgvi_tpu.ops.resize import resize_scale_quarter
    small = jax.jit(resize_scale_quarter)(
        ((masked.astype(jnp.float32) + 1.0) / 2.0).astype(DTYPE))
    ff, fb = jax.jit(e2fgvi.spynet_pairs)(
        params["spynet"], small[:-1], small[1:])
    fy = float(jnp.abs(ff[..., 1]).max()), float(jnp.abs(fb[..., 1]).max())
    print(f"flow_y bounds fwd={fy[0]:.2f} bwd={fy[1]:.2f}", flush=True)

    from e2fgvi_tpu.kernels import dcn_band as bl
    fmax = max(fy)
    band = bl.band_for_offset_bound(fmax + bl.RESIDUAL_MARGIN)
    print(f"band: {band}", flush=True)

    # per-strip row spans the banded DCN would sweep with offsets == flow
    flow = np.asarray(ff, np.float32)
    sr = 8
    hp = 64
    rel = flow[..., 1]                    # (T-1, 60, 108)
    relp = np.pad(rel, ((0, 0), (0, hp - rel.shape[1]), (0, 0)),
                  constant_values=np.nan)
    spans = []
    for s in range(hp // sr):
        blk = relp[:, s * sr: (s + 1) * sr]
        lo = np.nanmin(blk, axis=(1, 2))
        hi = np.nanmax(blk, axis=(1, 2))
        spans.append(hi - lo)
    spans = np.stack(spans)
    print(f"per-strip flow_y span: mean={np.nanmean(spans):.2f} "
          f"p90={np.nanpercentile(spans, 90):.2f} "
          f"max={np.nanmax(spans):.2f} (swept rows ~ span + tap2 + 2)",
          flush=True)

    # stage 3 geometry: all windows of the tennis video
    plans = pl_mod.plan_windows(t_video)
    n_local = max(len(p.neighbors) for p in plans)
    r_max = max(len(p.refs) for p in plans)
    t_pad = n_local + r_max
    b = len(plans)
    print(f"windows B={b} T_pad={t_pad} L={n_local}", flush=True)
    idx_all = np.zeros((b, t_pad), np.int32)
    bw = np.zeros((b, n_local - 1), np.int32)
    fw = np.zeros_like(bw)
    val = np.zeros((b,), np.int32)
    fval = np.zeros((b, t_pad), np.bool_)
    for wi, p in enumerate(plans):
        nv = len(p.neighbors)
        first = p.neighbors[0]
        nr = len(p.refs)
        idx_all[wi] = (p.neighbors + [p.neighbors[-1]] * (n_local - nv)
                       + p.refs + [p.refs[0] if nr else first]
                       * (r_max - nr))
        val[wi] = nv
        fval[wi, :nv] = True
        fval[wi, n_local: n_local + nr] = True
        last_pair = first + max(nv - 2, 0)
        i0 = n_local - nv
        s = np.arange(n_local - 1)
        bw[wi] = np.clip(first + s - i0, first, last_pair)
        fw[wi] = np.clip(first + s, first, last_pair)

    feat = jnp.take(feat_all, jnp.asarray(idx_all.reshape(-1)), axis=0)
    feat = feat.reshape(b, t_pad, *feat_all.shape[1:])
    ffw = jnp.take(ff, jnp.asarray(bw.reshape(-1)), axis=0).reshape(
        b, n_local - 1, *ff.shape[1:])
    fbw = jnp.take(fb, jnp.asarray(fw.reshape(-1)), axis=0).reshape(
        b, n_local - 1, *fb.shape[1:])
    valid = jnp.asarray(val)
    fvalid = jnp.asarray(fval)

    from e2fgvi_tpu.models import feat_prop as fp

    def fp_stage(p, feat, ffw, fbw, valid):
        return fp.bidirectional_propagation(
            p["feat_prop"], feat[:, :n_local], ffw, fbw, dcn_band=band,
            valid_len=valid)

    def window_stage(p, feat, ffw, fbw, valid, fvalid):
        out, _ = e2fgvi.window_stage(
            p, feat, (ffw, fbw), n_local, num_out=n_local, dcn_band=band,
            valid_local=valid, frame_valid=fvalid, with_offset_bound=True)
        return out

    for name, fn, args in [
        ("feat_prop_real", fp_stage, (params, feat, ffw, fbw, valid)),
        ("window_full_real", window_stage,
         (params, feat, ffw, fbw, valid, fvalid)),
    ]:
        dt = time_stage(jax.jit(fn), *args, iters=4)
        print(f"{name:22s} {dt * 1e3:8.2f} ms/video", flush=True)


if __name__ == "__main__":
    main()
