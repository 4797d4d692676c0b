"""Training-step smoke tests on the virtual CPU mesh (tiny shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2fgvi_tpu.models import discriminator, e2fgvi
from e2fgvi_tpu.parallel import mesh as meshlib
from e2fgvi_tpu.train import step as step_lib

LOSSES = {"hole_weight": 1, "valid_weight": 1, "flow_weight": 1,
          "adversarial_weight": 0.01}


@pytest.fixture(scope="module")
def tiny_state():
    params_g = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
    params_g["sc"]["bias"] = jnp.zeros((15, 27, 128), jnp.float32)
    params_d = discriminator.init_params(jax.random.PRNGKey(1))
    tx_g, tx_d = step_lib.make_optimizers(1e-4, lambda s: 1e-4,
                                          spynet_lr_mult=0.5)
    state = step_lib.init_train_state(params_g, params_d,
                                      params_g["spynet"], tx_g, tx_d)
    return state, tx_g, tx_d


def _batch(rng, b):
    frames = rng.uniform(-1, 1, (b, 6, 60, 108, 3)).astype(np.float32)
    masks = (rng.uniform(0, 1, (b, 6, 60, 108, 1)) > 0.7).astype(np.float32)
    return frames, masks


@pytest.mark.slow
def test_train_step_updates_and_logs(tiny_state, rng):
    state, tx_g, tx_d = tiny_state
    step = jax.jit(step_lib.make_train_step(tx_g, tx_d, 5, LOSSES))
    frames, masks = _batch(rng, 2)
    s1, logs = step(state, frames, masks)
    for k in ("gen_loss", "dis_loss", "flow_loss", "hole_loss",
              "valid_loss", "gan_loss"):
        assert k in logs and np.isfinite(float(logs[k])), k
    assert int(s1.step) == 1
    # params moved
    d0 = jax.tree_util.tree_leaves(state.params_g)[0]
    d1 = jax.tree_util.tree_leaves(s1.params_g)[0]
    assert float(jnp.abs(d0 - d1).max()) > 0
    # frozen spynet untouched
    f0 = jax.tree_util.tree_leaves(state.fixed_spynet)[0]
    f1 = jax.tree_util.tree_leaves(s1.fixed_spynet)[0]
    assert float(jnp.abs(f0 - f1).max()) == 0
    # second step decreases nothing catastrophic / still finite
    s2, logs2 = step(s1, frames, masks)
    assert np.isfinite(float(logs2["gen_loss"]))


@pytest.mark.slow
def test_train_step_sharded_over_mesh(tiny_state, rng):
    state, tx_g, tx_d = tiny_state
    mesh = meshlib.make_mesh(data=4, model=2)
    step_fn = step_lib.make_train_step(tx_g, tx_d, 5, LOSSES)
    with mesh:
        gsh = meshlib.generator_param_sharding(mesh, state.params_g)
        repl = meshlib.replicated(mesh)
        st = state._replace(
            params_g=jax.tree.map(jax.device_put, state.params_g, gsh),
            params_d=jax.device_put(state.params_d, repl),
            fixed_spynet=jax.device_put(state.fixed_spynet, repl))
        frames, masks = _batch(rng, 4)
        frames = jax.device_put(frames, meshlib.batch_sharding(mesh))
        masks = jax.device_put(masks, meshlib.batch_sharding(mesh))
        s1, logs = jax.jit(step_fn)(st, frames, masks)
        assert np.isfinite(float(logs["gen_loss"]))
        assert int(s1.step) == 1


@pytest.mark.slow
def test_no_dis_mode(tiny_state, rng):
    """no_dis=1 must work (the reference crashes on missing optimD)."""
    state, tx_g, tx_d = tiny_state
    step = jax.jit(step_lib.make_train_step(tx_g, tx_d, 5, LOSSES,
                                            no_dis=True))
    frames, masks = _batch(rng, 1)
    s1, logs = step(state, frames, masks)
    assert "dis_loss" not in logs and "gan_loss" not in logs
    assert np.isfinite(float(logs["gen_loss"]))
