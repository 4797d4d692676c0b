"""Whole-generator golden parity vs the REFERENCE torch implementation.

The goldens in tests/goldens/ were produced by scripts/make_golden.py
running the actual reference model (model/e2fgvi.py:236-263 wiring) with
deterministic weights — so this test fails if ANY inter-module wiring
(flow argument order at the propagation call site, local/ref split,
residual adds, soft-split/comp permutations) deviates from the reference,
independently of the per-module oracle tests.

Weights are rebuilt here from the stored (key, shape) list with the same
deterministic protocol (see scripts/make_golden.py docstring) and fed
through the real checkpoint converter — covering it end-to-end too.
"""

import ast
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2fgvi_tpu.convert.torch_loader import convert_generator
from e2fgvi_tpu.models import e2fgvi

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def fill_weight(key, shape, rng):
    # keep in sync with scripts/make_golden.py
    if key.endswith("norm1.weight") or key.endswith("norm2.weight"):
        return (1.0 + 0.05 * rng.standard_normal(shape)).astype(np.float32)
    if key.endswith(".bias"):
        return (0.02 * rng.standard_normal(shape)).astype(np.float32)
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else int(shape[0])
    return (0.5 / np.sqrt(fan_in)
            * rng.standard_normal(shape)).astype(np.float32)


@pytest.mark.parametrize("variant", ["base", "hq"])
def test_generator_matches_reference_golden(variant):
    data = np.load(os.path.join(GOLDEN_DIR, f"generator_{variant}.npz"))
    keys = [str(k) for k in data["keys"]]
    shapes = [ast.literal_eval(str(s)) for s in data["shapes"]]
    t, lt = int(data["t"]), int(data["lt"])
    h, w = int(data["h"]), int(data["w"])

    rng = np.random.default_rng(7)
    sd = {k: fill_weight(k, s, rng) for k, s in zip(keys, shapes)}
    params = convert_generator(sd, variant=variant)

    in_rng = np.random.default_rng(11)
    frames = in_rng.uniform(-1, 1, (1, t, 3, h, w)).astype(np.float32)
    frames_nhwc = jnp.asarray(frames.transpose(0, 1, 3, 4, 2))

    fwd = jax.jit(e2fgvi.generator_forward, static_argnums=2)
    out, (ff, fb) = fwd(params, frames_nhwc, lt)

    got = np.asarray(out).transpose(0, 3, 1, 2)[:, :, ::5, ::7]
    want = data["out_slice"]
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    assert err < 2e-3 * scale + 2e-5, (err, scale)

    # flows: ours are (B, L-1, h/4, w/4, 2) (dx, dy)-last; golden torch
    # layout (B, L-1, 2, h/4, w/4)
    got_ff = np.asarray(ff).transpose(0, 1, 4, 2, 3)[:, :, :, ::3, ::3]
    got_fb = np.asarray(fb).transpose(0, 1, 4, 2, 3)[:, :, :, ::3, ::3]
    fscale = np.abs(data["flow_f_slice"]).max()
    assert np.abs(got_ff - data["flow_f_slice"]).max() < 2e-3 * fscale + 2e-5
    assert np.abs(got_fb - data["flow_b_slice"]).max() < 2e-3 * fscale + 2e-5
