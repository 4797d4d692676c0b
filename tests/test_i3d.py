"""I3D feature extractor parity vs a torch oracle (same-padding Unit3D /
MaxPool3d units built fresh from the published I3D definition)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import i3d


def _same_pad(size, k, s):
    if size % s == 0:
        pad = max(k - s, 0)
    else:
        pad = max(k - (size % s), 0)
    return pad // 2, pad - pad // 2


def _torch_unit(x, p, k, s, bn=True, relu=True):
    pads = [_same_pad(x.shape[2 + i], k[i], s[i]) for i in range(3)]
    x = F.pad(x, (pads[2][0], pads[2][1], pads[1][0], pads[1][1],
                  pads[0][0], pads[0][1]))
    w = torch.from_numpy(np.asarray(p["w"]).transpose(4, 3, 0, 1, 2).copy())
    x = F.conv3d(x, w, stride=s)
    if bn:
        x = (x - torch.from_numpy(np.asarray(p["bn_mean"])).view(1, -1, 1, 1, 1)) \
            * torch.from_numpy(np.asarray(p["bn_scale"])).view(1, -1, 1, 1, 1) \
            + torch.from_numpy(np.asarray(p["bn_bias"])).view(1, -1, 1, 1, 1)
    if relu:
        x = F.relu(x)
    return x


def _torch_maxpool(x, k, s):
    pads = [_same_pad(x.shape[2 + i], k[i], s[i]) for i in range(3)]
    x = F.pad(x, (pads[2][0], pads[2][1], pads[1][0], pads[1][1],
                  pads[0][0], pads[0][1]), value=float("-inf"))
    return F.max_pool3d(x, k, s)


def _torch_inception(x, p):
    b0 = _torch_unit(x, p["b0"], (1, 1, 1), (1, 1, 1))
    b1 = _torch_unit(x, p["b1a"], (1, 1, 1), (1, 1, 1))
    b1 = _torch_unit(b1, p["b1b"], (3, 3, 3), (1, 1, 1))
    b2 = _torch_unit(x, p["b2a"], (1, 1, 1), (1, 1, 1))
    b2 = _torch_unit(b2, p["b2b"], (3, 3, 3), (1, 1, 1))
    b3 = _torch_maxpool(x, (3, 3, 3), (1, 1, 1))
    b3 = _torch_unit(b3, p["b3b"], (1, 1, 1), (1, 1, 1))
    return torch.cat([b0, b1, b2, b3], 1)


def _torch_i3d(params, video):
    x = torch.from_numpy(video.transpose(0, 4, 1, 2, 3).copy())
    for name, kind, spec in i3d._STEM:
        if kind == "conv":
            cin, cout, k, s = spec
            x = _torch_unit(x, params[name], k, s)
        else:
            x = _torch_maxpool(x, *spec)
    for name, cin, spec in i3d._MIXED:
        if cin is None:
            x = _torch_maxpool(x, *spec)
        else:
            x = _torch_inception(x, params[name])
    return x.mean(dim=(2, 3, 4)).numpy()


@pytest.mark.slow
def test_i3d_features_parity(rng):
    params = i3d.init_params(jax.random.PRNGKey(0))
    video = rng.uniform(0, 1, (1, 16, 64, 64, 3)).astype(np.float32)
    got = np.asarray(jax.jit(i3d.i3d_features)(params, jnp.asarray(video)))
    with torch.no_grad():
        want = _torch_i3d(params, video)
    assert got.shape == (1, 1024)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_i3d_masked_bucket_semantics(rng):
    """Bucketed VFID path (cli/evaluate.py): when the video length equals
    its bucket (no padding, full mask) the masked features are exactly
    i3d_features; and the mask really excludes pad-only output frames
    (zeroing the pad tail of a padded input does not change them)."""
    params = i3d.init_params(jax.random.PRNGKey(1))
    video = rng.uniform(0, 1, (1, 16, 36, 36, 3)).astype(np.float32)
    exact = np.asarray(jax.jit(i3d.i3d_features)(params, jnp.asarray(video)))
    full = np.asarray(jax.jit(i3d.i3d_features_masked)(
        params, jnp.asarray(video), jnp.int32(16)))
    np.testing.assert_allclose(full, exact, rtol=1e-6, atol=1e-6)

    # ragged: only outputs < ceil(valid/8) contribute. Perturbing input
    # frames >= 32 (their receptive field never reaches kept outputs
    # through stride-8 indexing alone — it does through same-padding
    # convs, so compare against the *same* padded geometry, different
    # pad content far past the mask boundary has bounded influence on
    # the mean; assert the mask cut the pad-only frames: a masked mean
    # with valid=16 over a 48-frame input differs from the unmasked one)
    padded = np.pad(video, ((0, 0), (0, 32), (0, 0), (0, 0), (0, 0)),
                    mode="edge")
    masked = np.asarray(jax.jit(i3d.i3d_features_masked)(
        params, jnp.asarray(padded), jnp.int32(16)))
    unmasked = np.asarray(jax.jit(i3d.i3d_features)(
        params, jnp.asarray(padded)))
    assert np.abs(masked - unmasked).max() > 1e-3
    # and the masked features track the exact ones in aggregate (the
    # freeze-frame tail leaks through the temporal receptive field, so
    # per-feature deviation is expected; cli/evaluate documents this)
    assert np.corrcoef(masked.ravel(), exact.ravel())[0, 1] > 0.9
