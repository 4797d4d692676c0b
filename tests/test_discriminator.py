"""Discriminator tests: spectral-norm parity vs torch, shapes, state."""

import numpy as np
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from e2fgvi_tpu.models import discriminator as disc
from e2fgvi_tpu.models.discriminator import spectral_normalize


def test_spectral_norm_matches_torch_after_convergence(rng):
    """After enough power iterations both implementations agree on sigma."""
    conv = nn.Conv3d(3, 8, (3, 5, 5), stride=(1, 2, 2), padding=1,
                     bias=False)
    torch.manual_seed(0)
    nn.init.normal_(conv.weight, 0, 0.5)
    snconv = nn.utils.spectral_norm(conv)
    x = torch.randn(1, 3, 4, 16, 16)
    snconv.train()
    for _ in range(50):  # converge u/v
        snconv(x)
    snconv.eval()
    with torch.no_grad():
        want = snconv(x).numpy()

    w_orig = snconv.weight_orig.detach().numpy()       # (O, I, kd, kh, kw)
    u = snconv.weight_u.detach().numpy()
    w_j = jnp.asarray(w_orig.transpose(2, 3, 4, 1, 0))  # DHWIO
    w_n, _ = spectral_normalize(w_j, jnp.asarray(u), update=False)

    from e2fgvi_tpu.ops.convs import conv3d
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    got = np.asarray(conv3d(xj, w_n, None, stride=(1, 2, 2),
                            padding=(1, 1, 1)))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 4, 1),
                               rtol=2e-3, atol=2e-3)


def test_discriminator_shapes_and_state(rng):
    params = disc.init_params(jax.random.PRNGKey(0))
    xs = jnp.asarray(rng.standard_normal((2, 5, 60, 108, 3)
                                         ).astype(np.float32))
    apply = jax.jit(disc.apply, static_argnums=(2, 3))
    logits, new_params = apply(params, xs, True, False)
    # T preserved (stride 1 on time), spatial /64 (6 stride-2 convs)
    assert logits.shape[0] == 2 and logits.shape[1] == 5
    assert logits.shape[-1] == 128
    # power-iteration state must move when update_stats=True
    moved = [
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(params["u"][:-1], new_params["u"][:-1])]
    assert all(moved)
    # ... and stay fixed in eval mode
    _, eval_params = apply(params, xs, False, False)
    same = [
        float(jnp.abs(a - b).max()) == 0
        for a, b in zip(params["u"], eval_params["u"])]
    assert all(same)
