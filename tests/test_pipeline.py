"""End-to-end pipeline test: the batched device-resident sliding-window
runner must equal a literal per-window reference computation (forward per
window, composite, 50/50 blend) on a small synthetic video."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2fgvi_tpu.data.pipeline import (SlidingWindowInpainter, plan_windows,
                                      mirror_pad_hw)
from e2fgvi_tpu.models import e2fgvi


@pytest.fixture(scope="module")
def hq_params():
    return e2fgvi.init_params(jax.random.PRNGKey(3), variant="hq")


def _make_video(rng, t, h, w):
    frames_u8 = rng.integers(0, 256, (t, h, w, 3), dtype=np.uint8)
    frames = frames_u8.astype(np.float32) / 255.0 * 2.0 - 1.0
    masks = np.zeros((t, h, w, 1), np.float32)
    masks[:, h // 4: h // 2, w // 4: w // 2] = 1.0
    binary = masks.astype(np.uint8)
    return frames, masks, frames_u8, binary


@pytest.mark.slow
def test_sliding_window_matches_reference_loop(hq_params, rng):
    t_video, h, w = 13, 120, 216
    frames, masks, orig, binary = _make_video(rng, t_video, h, w)

    runner = SlidingWindowInpainter(hq_params, e2fgvi.generator_forward,
                                    neighbor_stride=5, ref_length=10,
                                    max_batch=2)
    got = runner(frames, masks, orig, binary)

    # literal reference-loop computation (test.py:146-179 semantics)
    fwd = jax.jit(e2fgvi.generator_forward, static_argnums=2)
    masked = frames * (1 - masks)
    masked_p, _ = mirror_pad_hw(masked, 60, 108)
    comp = [None] * t_video
    for p in plan_windows(t_video, 5, 10, -1):
        sel = masked_p[p.ids][None]
        pred, _ = fwd(hq_params, jnp.asarray(sel), len(p.neighbors))
        pred = np.asarray(pred, np.float32)[:, :h, :w]
        pred = (pred + 1) / 2 * 255
        for i, idx in enumerate(p.neighbors):
            bm = binary[idx]
            img = (pred[i].astype(np.uint8) * bm +
                   orig[idx] * (1 - bm)).astype(np.float32)
            comp[idx] = img if comp[idx] is None else (
                comp[idx] * 0.5 + img * 0.5)

    assert len(got) == t_video
    for a, b in zip(got, comp):
        # device path computes in the same f32 but quantizes pred to uint8
        # on device exactly like the reference; results should agree to the
        # occasional off-by-one from borderline float rounding
        diff = np.abs(a - b)
        assert (diff > 1.0).mean() < 2e-3, diff.max()


@pytest.mark.slow
def test_uint8_input_fast_path_is_exact(hq_params, rng):
    """Passing the uint8 source frames directly (the CLI/bench fast path)
    must match passing the float frames derived from them — the pipeline
    re-quantizes floats to the same bytes."""
    t_video, h, w = 8, 120, 216
    frames, masks, orig, binary = _make_video(rng, t_video, h, w)
    r = SlidingWindowInpainter(hq_params, e2fgvi.generator_forward,
                               max_batch=4)
    a = r(frames, masks, orig, binary)
    b = r(orig, masks, orig, binary)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_batch_padding_is_exact(hq_params, rng):
    """A window computed alone must equal the same window inside a padded
    batch (batch entries are independent)."""
    t_video, h, w = 8, 120, 216
    frames, masks, orig, binary = _make_video(rng, t_video, h, w)
    r1 = SlidingWindowInpainter(hq_params, e2fgvi.generator_forward,
                                max_batch=1)
    r4 = SlidingWindowInpainter(hq_params, e2fgvi.generator_forward,
                                max_batch=4)
    a = r1(frames, masks, orig, binary)
    b = r4(frames, masks, orig, binary)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1.0)


def test_assemble_device_indexing_matches_host(hq_params):
    """The device-side gather-index derivation (_assemble: bit-packed mask
    -> flatnonzero -> per-pixel indices) must reproduce the host-built
    index path it replaced, for both output dtypes, including bucket
    padding, t_bucket zero-padded frames, and an empty mask."""
    runner = SlidingWindowInpainter(hq_params, e2fgvi.generator_forward)
    rng_l = np.random.default_rng(7)
    V, h, w = 5, 16, 24
    hp_i, wp_i = 16, 32
    rows, kmax, t_bucket = 9, 3, 6
    preds = rng_l.integers(0, 256, (rows, hp_i, wp_i, 3), np.uint8)
    idx_tab = rng_l.integers(0, rows, (V, kmax)).astype(np.int32)
    # the real blend's dyadic convex patterns (exact in f32/f16): each new
    # overlapping window halves prior weights — see pipeline contrib build
    patterns = ([1.0, 0.0, 0.0], [0.5, 0.5, 0.0], [0.25, 0.25, 0.5])
    wt_tab = np.asarray([patterns[i % 3] for i in range(V)], np.float32)
    for density in (0.0, 0.3, 1.0):
        bm = rng_l.random((V, h, w)) < density
        mask_idx = np.flatnonzero(bm)
        n_masked = mask_idx.size
        bucket = 1 << max(6, int(np.ceil(np.log2(max(1, n_masked)))))
        # host reference (the replaced path)
        fidx = mask_idx // (h * w)
        rem = mask_idx % (h * w)
        pos = (rem // w) * wp_i + rem % w
        pidx = idx_tab[fidx] * (hp_i * wp_i) + pos[:, None]
        wts = wt_tab[fidx]
        flat = preds.reshape(-1, 3).astype(np.float32)
        ref = (flat[pidx] * wts[..., None]).sum(1)
        # device path, padded exactly as the pipeline pads
        mask_bits = np.packbits(bm.reshape(-1))
        pad = (t_bucket * h * w + 7) // 8 - mask_bits.size
        mask_bits = np.concatenate([mask_bits, np.zeros(pad, np.uint8)])
        idx_p = np.concatenate(
            [idx_tab, np.zeros((t_bucket - V, kmax), np.int32)])
        wt_p = np.concatenate(
            [wt_tab, np.zeros((t_bucket - V, kmax), np.float32)])
        for to_u8 in (True, False):
            out = np.asarray(runner._assemble_jit(
                jnp.asarray(preds), jnp.asarray(mask_bits),
                jnp.asarray(idx_p), jnp.asarray(wt_p),
                (bucket, h, w, hp_i, wp_i, to_u8)))[:n_masked]
            want = (ref.astype(np.uint8) if to_u8
                    else ref.astype(np.float16))
            assert out.shape == want.shape
            np.testing.assert_array_equal(out, want)


def test_ref_ids_matches_reference_enumeration():
    """Pin the strided-reference enumeration incl. the num_ref>0 window
    and its `>` off-by-one (reference test.py:39-53) for num_ref in
    {-1, 1, 3, 5} — only the -1 path was previously asserted."""
    from e2fgvi_tpu.data.pipeline import neighbor_ids, ref_ids

    ref_length = 10

    def reference_get(f, nbs, length, num_ref):
        # literal transcription of reference test.py:39-53
        out = []
        if num_ref == -1:
            for i in range(0, length, ref_length):
                if i not in nbs:
                    out.append(i)
        else:
            start_idx = max(0, f - ref_length * (num_ref // 2))
            end_idx = min(length, f + ref_length * (num_ref // 2))
            for i in range(start_idx, end_idx + 1, ref_length):
                if i not in nbs:
                    if len(out) > num_ref:
                        break
                    out.append(i)
        return out

    for length in (12, 37, 70, 95):
        for num_ref in (-1, 1, 3, 5):
            for f in range(0, length, 5):
                nbs = neighbor_ids(f, length)
                assert ref_ids(f, nbs, length, ref_length, num_ref) == \
                    reference_get(f, nbs, length, num_ref), \
                    (length, num_ref, f)


@pytest.mark.slow
def test_speculative_band_hint_revalidates(rng):
    """A WRONG cross-video band hint (r05 speculation, pipeline stage 2.5)
    must be caught by the offset/warp-bound validation and re-dispatched:
    output equals the XLA-sampler run exactly, redispatches >= 1, and the
    settled hint satisfies the measured bounds. Forced on CPU via the
    interpret-light kernels (_banded_dcn is TPU-gated in production)."""
    params = e2fgvi.init_params(jax.random.PRNGKey(5), variant="base")
    # moderate flows: large enough that band 16 is too narrow, small
    # enough that a legal bucket exists
    for mod in params["spynet"]["modules"]:
        last = sorted(mod)[-1]
        mod[last]["w"] = mod[last]["w"] * 0.02
    t_video, h, w = 6, 60, 108
    # shrink the base model's learned sc bias map to this video's 15x27
    # feature grid (it is sized for 432x240; same move as the dryrun)
    params["sc"]["bias"] = jnp.zeros((15, 27, 128), jnp.float32)
    frames, masks, orig, binary = _make_video(rng, t_video, h, w)

    ref = SlidingWindowInpainter(params, e2fgvi.generator_forward,
                                 max_batch=2, band_override=0)
    want = ref(frames, masks, orig, binary)

    runner = SlidingWindowInpainter(params, e2fgvi.generator_forward,
                                    max_batch=2)
    runner._banded_dcn = True          # lift the TPU gate (light kernels)
    runner._band_hint = 16             # deliberately too-narrow hint
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = runner(frames, masks, orig, binary)
    st = runner.last_band_stats
    from e2fgvi_tpu.kernels import dcn_band as bandlib
    need = bandlib.band_for_offset_bound(st["offset_bound"])
    wneed = bandlib.band_for_warp_bound(st["flow_bound"])
    if st["band"] is not None:
        assert need is not None and need <= st["band"]
        assert wneed is not None and wneed <= st["band"]
    if need is None or max(need, wneed) > 16:
        # the hint really was too narrow -> the validation must have fired
        assert st["redispatches"] >= 1 or st["band"] is None
    assert runner._band_hint == st["band"]
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
