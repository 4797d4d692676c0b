"""Checkpoint-converter tests.

Builds a synthetic torch state dict with the exact reference key layout and
shapes (SURVEY.md §8.2), converts it, and checks (a) pytree structure and
shapes match init_params, and (b) the permuted linears are numerically
faithful (torch Linear on c-major patches == my linear on k-major patches).
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from e2fgvi_tpu.convert import torch_loader
from e2fgvi_tpu.models import e2fgvi


def synthetic_generator_state_dict(variant="base", depths=8, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    enc_ch = [(3, 64), (64, 64), (64, 128), (128, 256), (256, 384),
              (640 // 2, 512), (768 // 4, 384), (640 // 8, 256), (512, 128)]
    for i, (cin, cout) in enumerate(enc_ch):
        sd[f"encoder.layers.{2 * i}.weight"] = t(cout, cin, 3, 3)
        sd[f"encoder.layers.{2 * i}.bias"] = t(cout)
    for name, cin, cout in (("decoder.0.conv", 128, 128),
                            ("decoder.2", 128, 64),
                            ("decoder.4.conv", 64, 64),
                            ("decoder.6", 64, 3)):
        sd[f"{name}.weight"] = t(cout, cin, 3, 3)
        sd[f"{name}.bias"] = t(cout)
    for tk in ("backward_", "forward_"):
        base = f"feat_prop_module.deform_align.{tk}"
        sd[f"{base}.weight"] = t(128, 256, 3, 3)
        sd[f"{base}.bias"] = t(128)
        for j, (ci, co) in zip((0, 2, 4, 6),
                               ((388, 128), (128, 128), (128, 128),
                                (128, 432))):
            sd[f"{base}.conv_offset.{j}.weight"] = t(co, ci, 3, 3)
            sd[f"{base}.conv_offset.{j}.bias"] = t(co)
        i = 0 if tk == "backward_" else 1
        for j, (ci, co) in zip((0, 2), (((2 + i) * 128, 128), (128, 128))):
            sd[f"feat_prop_module.backbone.{tk}.{j}.weight"] = t(co, ci, 3, 3)
            sd[f"feat_prop_module.backbone.{tk}.{j}.bias"] = t(co)
    sd["feat_prop_module.fusion.weight"] = t(128, 256, 1, 1)
    sd["feat_prop_module.fusion.bias"] = t(128)
    sd["ss.embedding.weight"] = t(512, 6272)
    sd["ss.embedding.bias"] = t(512)
    sd["sc.embedding.weight"] = t(6272, 512)
    sd["sc.embedding.bias"] = t(6272)
    if variant == "base":
        sd["sc.bias"] = t(128, 60, 108)
    else:
        sd["sc.bias_conv.weight"] = t(128, 128, 3, 3)
        sd["sc.bias_conv.bias"] = t(128)
    for i in range(depths):
        p = f"transformer.{i}"
        sd[f"{p}.norm1.weight"] = t(512)
        sd[f"{p}.norm1.bias"] = t(512)
        sd[f"{p}.norm2.weight"] = t(512)
        sd[f"{p}.norm2.bias"] = t(512)
        sd[f"{p}.attn.qkv.weight"] = t(1536, 512)
        sd[f"{p}.attn.qkv.bias"] = t(1536)
        sd[f"{p}.attn.proj.weight"] = t(512, 512)
        sd[f"{p}.attn.proj.bias"] = t(512)
        sd[f"{p}.mlp.conv1.0.weight"] = t(1960, 512)
        sd[f"{p}.mlp.conv1.0.bias"] = t(1960)
        sd[f"{p}.mlp.conv2.1.weight"] = t(512, 1960)
        sd[f"{p}.mlp.conv2.1.bias"] = t(512)
        sd[f"{p}.pool_layers.0.weight"] = t(1, 45)
        sd[f"{p}.pool_layers.0.bias"] = t(1)
    for l in range(6):
        for m, (ci, co) in enumerate(((8, 32), (32, 64), (64, 32), (32, 16),
                                      (16, 2))):
            base = f"update_spynet.basic_module.{l}.basic_module.{m}.conv"
            sd[f"{base}.weight"] = t(co, ci, 7, 7)
            sd[f"{base}.bias"] = t(co)
    return sd


@pytest.mark.parametrize("variant", ["base", "hq"])
def test_convert_generator_structure(variant):
    sd = synthetic_generator_state_dict(variant)
    converted = torch_loader.convert_generator(sd, variant)
    ref = e2fgvi.init_params(jax.random.PRNGKey(0), variant=variant)

    c_shapes = jax.tree.map(lambda x: x.shape, converted)
    r_shapes = jax.tree.map(lambda x: x.shape, ref)
    assert jax.tree_util.tree_structure(c_shapes) == \
        jax.tree_util.tree_structure(r_shapes)
    mismatches = [
        (p, a, b) for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(c_shapes),
            jax.tree_util.tree_leaves_with_path(r_shapes)) if a != b]
    assert not mismatches, mismatches[:5]


def test_patch_linear_in_numeric(rng):
    """torch Linear over c-major unfold == converted linear over k-major."""
    import torch.nn.functional as F
    c, k, hidden = 16, 49, 32
    w = torch.randn(hidden, c * k) * 0.1
    b = torch.randn(hidden)
    sd = {"lin.weight": w, "lin.bias": b}
    conv = torch_loader._patch_linear_in(sd, "lin", c, k)

    x = rng.standard_normal((2, 13, 17, c), dtype=np.float32)
    tx = torch.from_numpy(np.moveaxis(x, -1, 1))
    u = F.unfold(tx, (7, 7), padding=3, stride=3)       # (N, c*49, L)
    want = (torch.einsum("ncl,hc->nlh", u, w) + b).numpy()

    from e2fgvi_tpu.ops.patches import unfold
    from e2fgvi_tpu.ops.convs import linear
    p = unfold(jnp.asarray(x), (7, 7), (3, 3), (3, 3))
    n, lh, lw = p.shape[:3]
    got = np.asarray(linear(p.reshape(n, lh * lw, -1), conv["w"],
                            conv["b"]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_patch_linear_out_numeric(rng):
    import torch.nn.functional as F
    c, k, hidden = 8, 49, 24
    w = torch.randn(c * k, hidden) * 0.1
    b = torch.randn(c * k)
    sd = {"lin.weight": w, "lin.bias": b}
    conv = torch_loader._patch_linear_out(sd, "lin", c, k)

    tok = rng.standard_normal((2, 15, hidden), dtype=np.float32)
    want = (torch.from_numpy(tok) @ w.T + b).numpy()  # (2, 15, c*49) c-major

    from e2fgvi_tpu.ops.convs import linear
    got = np.asarray(linear(jnp.asarray(tok), conv["w"], conv["b"]))
    # reorder mine (k-major) to c-major for comparison
    got = got.reshape(2, 15, k, c).transpose(0, 1, 3, 2).reshape(2, 15, -1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
