"""Uniform-geometry window padding must be exact.

The pipeline end-pads every sliding window to one (T_pad, L) geometry so a
whole video runs as a single batched forward (data/pipeline.py stage 3).
Exactness rests on two masks: feat_prop's valid_len cold-start reset and
the attention frame_valid key mask (models/feat_prop.py,
models/tfocal.py). This test drives window_stage both ways — unpadded at
each window's true geometry vs end-padded with masks — and requires the
real frames' outputs to match.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2fgvi_tpu.models import e2fgvi


@pytest.fixture(scope="module")
def setup():
    params = e2fgvi.init_params(jax.random.PRNGKey(7), variant="base")
    rng = np.random.default_rng(3)
    feat_all = jnp.asarray(
        rng.standard_normal((7, 60, 108, 128)), jnp.float32)
    flows_f = jnp.asarray(
        rng.standard_normal((6, 60, 108, 2)) * 1.5, jnp.float32)
    flows_b = jnp.asarray(
        rng.standard_normal((6, 60, 108, 2)) * 1.5, jnp.float32)
    return params, feat_all, flows_f, flows_b


@pytest.mark.slow
def test_padded_window_matches_unpadded(setup):
    params, feat_all, flows_f, flows_b = setup
    # window: neighbors [0..3] (nv=4), refs [5] -> true geometry T=5, L=4
    nb, refs = [0, 1, 2, 3], [5]
    nv, first = len(nb), nb[0]

    ids = nb + refs
    feat_u = jnp.take(feat_all, jnp.asarray(ids), axis=0)[None]
    pair = jnp.asarray([first + s for s in range(nv - 1)])
    ff_u = jnp.take(flows_f, pair, axis=0)[None]
    fb_u = jnp.take(flows_b, pair, axis=0)[None]
    want = np.asarray(e2fgvi.window_stage(
        params, feat_u, (ff_u, fb_u), nv, num_out=nv))

    # end-padded to L=5 locals + R_max=2 refs (T_pad=7)
    L, r_max = 5, 2
    idx = nb + [nb[-1]] * (L - nv) + refs + [refs[0]] * (r_max - len(refs))
    fval = np.zeros((1, L + r_max), np.bool_)
    fval[0, :nv] = True
    fval[0, L: L + len(refs)] = True
    i0 = L - nv
    last_pair = first + nv - 2
    s = np.arange(L - 1)
    bw = np.clip(first + s - i0, first, last_pair)
    fw = np.clip(first + s, first, last_pair)

    feat_p = jnp.take(feat_all, jnp.asarray(idx), axis=0)[None]
    ff_p = jnp.take(flows_f, jnp.asarray(bw), axis=0)[None]
    fb_p = jnp.take(flows_b, jnp.asarray(fw), axis=0)[None]
    got = np.asarray(e2fgvi.window_stage(
        params, feat_p, (ff_p, fb_p), L, num_out=L,
        valid_local=jnp.asarray([nv], jnp.int32),
        frame_valid=jnp.asarray(fval)))

    np.testing.assert_allclose(got[:, :nv], want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_full_window_with_masks_is_identity(setup):
    """A window that needs no padding must be bit-identical through the
    masked path (valid == L, all frames valid)."""
    params, feat_all, flows_f, flows_b = setup
    nb, refs = [0, 1, 2, 3, 4], [6]
    nv, first = len(nb), nb[0]
    ids = nb + refs
    feat = jnp.take(feat_all, jnp.asarray(ids), axis=0)[None]
    pair = jnp.asarray([first + s for s in range(nv - 1)])
    ff = jnp.take(flows_f, pair, axis=0)[None]
    fb = jnp.take(flows_b, pair, axis=0)[None]
    want = np.asarray(e2fgvi.window_stage(
        params, feat, (ff, fb), nv, num_out=nv))
    fval = np.ones((1, len(ids)), np.bool_)
    got = np.asarray(e2fgvi.window_stage(
        params, feat, (ff, fb), nv, num_out=nv,
        valid_local=jnp.asarray([nv], jnp.int32),
        frame_valid=jnp.asarray(fval)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
