"""Golden tests: ops.patches (unfold/fold) vs torch nn.Unfold/nn.Fold."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from e2fgvi_tpu.ops.patches import unfold, fold, fold_normalized, unfold_shape


CASES = [
    # (h, w, kernel, stride, padding) — first is the E2FGVI soft-split config
    (60, 108, (7, 7), (3, 3), (3, 3)),
    (13, 17, (3, 5), (2, 1), (1, 2)),
    (4, 4, (5, 9), (1, 1), (2, 4)),   # focal pooled-key unfold config
]


def _to_torch_layout(p):
    """(N, Lh, Lw, kh, kw, C) -> torch (N, C*kh*kw, L), c-major channels."""
    n, lh, lw, kh, kw, c = p.shape
    return np.transpose(p, (0, 5, 3, 4, 1, 2)).reshape(n, c * kh * kw, lh * lw)


@pytest.mark.parametrize("h,w,k,s,p", CASES)
def test_unfold_matches_torch(rng, h, w, k, s, p):
    n, c = 2, 3
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    t = torch.from_numpy(np.moveaxis(x, -1, 1))
    ref = torch.nn.Unfold(kernel_size=k, stride=s, padding=p)(t).numpy()
    got = np.asarray(unfold(jnp.asarray(x), k, s, p))
    assert got.shape[1:3] == unfold_shape(h, w, k, s, p)
    np.testing.assert_allclose(_to_torch_layout(got), ref, atol=1e-6)


@pytest.mark.parametrize("h,w,k,s,p", CASES)
def test_fold_matches_torch(rng, h, w, k, s, p):
    n, c = 2, 3
    lh, lw = unfold_shape(h, w, k, s, p)
    patches = rng.standard_normal((n, lh, lw, k[0], k[1], c),
                                  dtype=np.float32)
    ref = torch.nn.Fold(output_size=(h, w), kernel_size=k, stride=s,
                        padding=p)(
        torch.from_numpy(_to_torch_layout(patches))).numpy()
    ref = np.moveaxis(ref, 1, -1)
    got = np.asarray(fold(jnp.asarray(patches), (h, w), k, s, p))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fold_normalized_roundtrip(rng):
    """F3N roundtrip: fold-normalize-unfold of an unfolded image returns
    a blended version whose DC behavior matches torch (tf.py:92-96)."""
    h, w, k, s, p = 60, 108, (7, 7), (3, 3), (3, 3)
    x = rng.standard_normal((1, h, w, 2), dtype=np.float32)
    u = unfold(jnp.asarray(x), k, s, p)
    y = fold_normalized(u, (h, w), k, s, p)
    # torch oracle
    t = torch.from_numpy(np.moveaxis(x, -1, 1))
    tu = torch.nn.Unfold(k, padding=p, stride=s)(t)
    ones = torch.ones_like(tu)
    f = torch.nn.Fold((h, w), k, padding=p, stride=s)
    ref = (f(tu) / f(ones)).numpy()
    np.testing.assert_allclose(np.asarray(y), np.moveaxis(ref, 1, -1),
                               rtol=1e-5, atol=1e-5)
