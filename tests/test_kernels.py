"""Pallas kernel tests (interpret mode on CPU; device runs exercised by
bench/profiling scripts on the TPU)."""

import numpy as np
import jax.numpy as jnp

from e2fgvi_tpu.kernels.f3n import f3n_mix
from e2fgvi_tpu.ops.patches import unfold, fold_normalized


def test_f3n_mix_matches_composed_ops(rng):
    h, w, c = 60, 108, 8
    lh, lw = 20, 36
    n = 3
    tokens = rng.standard_normal((n, lh, lw, 49 * c)).astype(np.float32)

    got = np.asarray(f3n_mix(jnp.asarray(tokens), (h, w), interpret=True))

    p = jnp.asarray(tokens).reshape(n, lh, lw, 7, 7, c)
    y = fold_normalized(p, (h, w), (7, 7), (3, 3), (3, 3))
    want = np.asarray(unfold(y, (7, 7), (3, 3), (3, 3))).reshape(
        n, lh, lw, 49 * c)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
