"""Generator-level tests: shapes, determinism, HQ path, converter wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2fgvi_tpu.models import e2fgvi


@pytest.fixture(scope="module")
def gen_params():
    return e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")


@pytest.mark.slow
def test_generator_forward_shapes(gen_params, rng):
    b, t, lt = 1, 4, 3
    h, w = 240, 432
    frames = (rng.uniform(-1, 1, (b, t, h, w, 3))).astype(np.float32)
    fwd = jax.jit(e2fgvi.generator_forward, static_argnums=2)
    out, flows = fwd(gen_params, jnp.asarray(frames), lt)
    assert out.shape == (b * t, h, w, 3)
    assert flows[0].shape == (b, lt - 1, h // 4, w // 4, 2)
    assert flows[1].shape == (b, lt - 1, h // 4, w // 4, 2)
    o = np.asarray(out)
    assert np.all(np.abs(o) <= 1.0)
    assert np.isfinite(o).all()


def test_generator_hq_arbitrary_resolution(rng):
    params = e2fgvi.init_params(jax.random.PRNGKey(1), variant="hq")
    b, t, lt = 1, 3, 2
    # 120x216 = smallest (60,108)-modulus resolution, token grid 10x27... no:
    # features 30x54 -> token grid 10x18, windows (5,9) tile exactly.
    h, w = 120, 216
    frames = (rng.uniform(-1, 1, (b, t, h, w, 3))).astype(np.float32)
    fwd = jax.jit(e2fgvi.generator_forward, static_argnums=2)
    out, _ = fwd(params, jnp.asarray(frames), lt)
    assert out.shape == (b * t, h, w, 3)
    assert np.isfinite(np.asarray(out)).all()
