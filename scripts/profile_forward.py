"""Reproducible per-stage budget of the inference pipeline (SURVEY §5.1).

Times every pipeline stage (encode chunk, flow chunk, window forward) and
the window forward's sub-stages (feat_prop, transformer stack, soft
split/comp, decoder) at the bench geometry, then prints a JSON budget and
writes it to results/profile_r{round}.json.

Run: PYTHONPATH=. python scripts/profile_forward.py            (TPU)
     E2FGVI_PROFILE_BATCH=4 ... to change the window batch.

All timings are tunnel-corrected device dispatch+execute times (see
e2fgvi_tpu.utils.profiling).
"""

import json
import os

import numpy as np

from e2fgvi_tpu.utils import env

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
env.setup()

import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import e2fgvi, feat_prop, tfocal
from e2fgvi_tpu.utils.profiling import time_stage

B = int(os.environ.get("E2FGVI_PROFILE_BATCH", "14"))
T_VIDEO = 70
T_WIN, N_LOCAL = 17, 11     # the dominant tennis-bench window geometry
H, W = 240, 432
HQ, WQ, C = 60, 108, 128
HS, WS = 60, 108
CH = 35
DTYPE = jnp.bfloat16


def main():
    rng = np.random.default_rng(0)
    params = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
    params = jax.tree.map(
        lambda x: x.astype(DTYPE) if hasattr(x, "astype")
        and x.dtype == jnp.float32 else x, params)

    frames_u8 = jnp.asarray(
        rng.integers(0, 256, (T_VIDEO, H, W, 3), np.uint8))
    masks_u8 = jnp.asarray(
        (rng.uniform(size=(T_VIDEO, H, W, 1)) < 0.1).astype(np.uint8))
    idx_enc = jnp.arange(CH, dtype=jnp.int32)
    feat = jnp.asarray(rng.standard_normal((B, T_WIN, HQ, WQ, C)), DTYPE)
    # smooth flows with tennis-like magnitude (a few px at quarter res,
    # |flow_y| max ~4.3): per-pixel N(0, 2) noise flows made every strip's
    # vertical span cover the whole band, so feat_prop profiled the
    # full-sweep worst case at band 48 instead of the serving path's
    # gated sweep at the speculative band (r01-r04 profiles)
    yy = np.linspace(0, 2 * np.pi, HS)[:, None]
    xx = np.linspace(0, 2 * np.pi, WS)[None, :]
    base = np.stack([np.sin(yy * 1.1) * np.cos(xx * 0.7),
                     np.cos(yy * 0.9) * np.sin(xx * 1.3)], axis=-1)
    flows = jnp.asarray(
        3.0 * base[None, None]
        + rng.standard_normal((B, N_LOCAL - 1, HS, WS, 2)) * 0.25, DTYPE)
    small_all = jnp.asarray(
        rng.uniform(size=(T_VIDEO, HS, WS, 3)), DTYPE)
    pidx = jnp.arange(CH, dtype=jnp.int32)
    tokens = jnp.asarray(
        rng.standard_normal((B, T_WIN, 20, 36, 512)), DTYPE)

    from e2fgvi_tpu.ops.resize import resize_scale_quarter

    @jax.jit
    def enc_stage(p, fr, mk, idx):
        f = jnp.take(fr, idx, axis=0).astype(jnp.float32) / 255. * 2 - 1
        m = jnp.take(mk, idx, axis=0).astype(jnp.float32)
        masked = (f * (1 - m)).astype(DTYPE)
        return (e2fgvi.encode(p["encoder"], masked),
                resize_scale_quarter((masked + 1) / 2))

    @jax.jit
    def flow_stage(p, sm, i):
        a = jnp.take(sm, i, axis=0)
        b = jnp.take(sm, i + 1, axis=0)
        return e2fgvi.spynet_pairs(p["spynet"], a, b)

    # match the real pipeline's SPECULATIVE band (data/pipeline.py stage
    # 2.5): measured |flow_y| + RESIDUAL_MARGIN through
    # band_for_offset_bound — the serving dispatch, not the worst-case
    # band_for_flow_bound (which assumes the full tanh residual and
    # profiled band 48 where serving runs 16-24)
    dcn_band = None
    if jax.default_backend() == "tpu":
        from e2fgvi_tpu.kernels import dcn_band as bandlib
        fy = float(np.abs(np.asarray(flows[..., 1], np.float32)).max())
        dcn_band = bandlib.band_for_offset_bound(
            fy + bandlib.RESIDUAL_MARGIN)

    @jax.jit
    def fp_stage(p, feat, ff, fb):
        return feat_prop.bidirectional_propagation(
            p["feat_prop"], feat[:, :N_LOCAL], ff, fb, dcn_band=dcn_band)

    @jax.jit
    def blocks_stage(p, tok):
        return tfocal.transformer_stack(p["transformer"], tok, (HQ, WQ),
                                        e2fgvi.NUM_HEADS,
                                        e2fgvi.WINDOW_SIZE,
                                        e2fgvi.FOCAL_LEVEL)

    # transformer sub-ablations: one block's attention half vs F3N half
    blk = jax.tree.map(lambda x: x[0] if hasattr(x, "shape") else x,
                       jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *params["transformer"]))

    @jax.jit
    def attn_half(p, tok):
        b, t, h, w, c = tok.shape
        wh, ww = e2fgvi.WINDOW_SIZE
        from e2fgvi_tpu.models.tfocal import (_pool_level, _window_reverse,
                                              layer_norm, window_attention)
        xn = layer_norm(tok, p["norm1"]["g"], p["norm1"]["b"])
        pooled = _pool_level(p, xn, (wh, ww))
        a = window_attention(p["attn"], xn, pooled, e2fgvi.NUM_HEADS,
                             (wh, ww), (wh // 2, ww // 2))
        a = a.reshape(b * (h // wh) * (w // ww), t, wh, ww, c)
        return tok + _window_reverse(a, wh, ww, b, t, h, w)

    @jax.jit
    def f3n_half(p, tok):
        b, t, h, w, c = tok.shape
        from e2fgvi_tpu.models.tfocal import fusion_feed_forward, layer_norm
        y = layer_norm(tok, p["norm2"]["g"], p["norm2"]["b"])
        y = fusion_feed_forward(p["mlp"], y.reshape(b, t * h * w, c), t,
                                (HQ, WQ))
        return tok + y.reshape(b, t, h, w, c)

    @jax.jit
    def sssc_stage(p, feat):
        b, t = feat.shape[:2]
        tok = tfocal.soft_split(p["ss"], feat.reshape(b * t, HQ, WQ, C), b)
        return tfocal.soft_comp(p["sc"], tok, t, (HQ, WQ))

    @jax.jit
    def dec_stage(p, feat):
        b = feat.shape[0]
        x = feat[:, :N_LOCAL].reshape(b * N_LOCAL, HQ, WQ, C)
        return jnp.tanh(e2fgvi.decode(p["decoder"], x))

    @jax.jit
    def window_stage(p, feat, ff, fb):
        return e2fgvi.window_stage(p, feat, (ff, fb), N_LOCAL,
                                   num_out=N_LOCAL, dcn_band=dcn_band)

    n_windows = -(-T_VIDEO // 5)
    stages = [
        # (name, fn, args, calls per 70-frame video at window-batch B)
        ("encode_chunk35", enc_stage,
         (params, frames_u8, masks_u8, idx_enc), T_VIDEO / CH),
        ("flow_chunk35", flow_stage, (params, small_all, pidx),
         T_VIDEO / CH),
        ("feat_prop_B", fp_stage, (params, feat, flows, flows),
         n_windows / B),
        ("transformer8_B", blocks_stage, (params, tokens), n_windows / B),
        ("attn_half_1blk", attn_half, (blk, tokens), 8 * n_windows / B),
        ("f3n_half_1blk", f3n_half, (blk, tokens), 8 * n_windows / B),
        ("softsplit_comp_B", sssc_stage, (params, feat), n_windows / B),
        ("decoder_local_B", dec_stage, (params, feat), n_windows / B),
        ("window_full_B", window_stage, (params, feat, flows, flows),
         n_windows / B),
    ]

    budget = {"window_batch": B, "dtype": "bfloat16",
              "geometry": f"{W}x{H} T={T_WIN} L={N_LOCAL}", "stages": {}}
    for name, fn, args, calls in stages:
        dt = time_stage(fn, *args, iters=4)
        budget["stages"][name] = {
            "ms_per_call": round(dt * 1e3, 2),
            "calls_per_video": round(calls, 2),
            "ms_per_video": round(dt * 1e3 * calls, 1),
        }
        print(json.dumps({"stage": name, **budget["stages"][name]}),
              flush=True)

    wf = budget["stages"]["window_full_B"]["ms_per_video"]
    enc = budget["stages"]["encode_chunk35"]["ms_per_video"]
    flw = budget["stages"]["flow_chunk35"]["ms_per_video"]
    est = enc + flw + wf
    budget["est_device_ms_per_video"] = round(est, 1)
    budget["est_device_fps"] = round(T_VIDEO / (est / 1e3), 2)
    print(json.dumps({"est_device_ms_per_video": budget[
        "est_device_ms_per_video"],
        "est_device_fps": budget["est_device_fps"]}), flush=True)

    os.makedirs("results", exist_ok=True)
    out = os.environ.get("E2FGVI_PROFILE_OUT", "results/profile_r04.json")
    with open(out, "w") as f:
        json.dump(budget, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
