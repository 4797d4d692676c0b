"""Convert released E2FGVI torch checkpoints into e2fgvi_tpu pytrees.

Handles `E2FGVI-CVPR22.pth` / `E2FGVI-HQ-CVPR22.pth` (generator), `dis_*.pth`
(discriminator), and `spynet_*.pth` (pretrained SPyNet for training). Layout
notes (state-dict key map documented in SURVEY.md §8.2):

- conv weights OIHW -> HWIO (conv3d OIDHW -> DHWIO); Linear weights
  transpose to (in, out).
- the soft-split/soft-comp embeddings and the F3N fc1/fc2 are additionally
  PERMUTED: torch flattens patch features channel-major (c*49+k) while this
  framework is kernel-major (k*C+c) so fold/unfold run without runtime
  transposes (see models/tfocal.py docstring).
- registered buffers (spynet mean/std, attention valid-index tables) are
  recomputed statically, not loaded.

Works from numpy only (state dict tensors are converted with .numpy());
torch is required just to deserialize the .pth.
"""

import numpy as np
import jax.numpy as jnp


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv(sd, prefix, transpose=(2, 3, 1, 0)):
    return {"w": jnp.asarray(_t(sd[prefix + ".weight"]).transpose(*transpose)),
            "b": jnp.asarray(_t(sd[prefix + ".bias"]))}


def _linear(sd, prefix):
    return {"w": jnp.asarray(_t(sd[prefix + ".weight"]).T),
            "b": jnp.asarray(_t(sd[prefix + ".bias"]))}


def _patch_linear_in(sd, prefix, c, k):
    """Linear whose INPUT is a flattened patch: reorder (c,k) -> (k,c)."""
    w = _t(sd[prefix + ".weight"])          # (out, c*k)
    out = w.shape[0]
    w = w.reshape(out, c, k).transpose(2, 1, 0).reshape(k * c, out)
    return {"w": jnp.asarray(w), "b": jnp.asarray(_t(sd[prefix + ".bias"]))}


def _patch_linear_out(sd, prefix, c, k):
    """Linear whose OUTPUT is a flattened patch: reorder (c,k) -> (k,c)."""
    w = _t(sd[prefix + ".weight"])          # (c*k, in)
    cin = w.shape[1]
    w = w.reshape(c, k, cin).transpose(1, 0, 2).reshape(k * c, cin).T
    b = _t(sd[prefix + ".bias"]).reshape(c, k).T.reshape(-1)
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def convert_spynet(sd, prefix=""):
    """SPyNet keys: {prefix}basic_module.{l}.basic_module.{m}.conv.*"""
    mods = []
    for l in range(6):
        mod = {}
        for m in range(5):
            mod[f"conv{m}"] = _conv(
                sd, f"{prefix}basic_module.{l}.basic_module.{m}.conv")
        mods.append(mod)
    return {"modules": mods}


def convert_generator(sd, variant="base"):
    """Full generator state dict -> e2fgvi_tpu pytree.

    variant: 'base' or 'hq' (selects soft-comp bias layout)."""
    p = {}

    p["encoder"] = [_conv(sd, f"encoder.layers.{2 * i}") for i in range(9)]
    p["decoder"] = [
        _conv(sd, "decoder.0.conv"),
        _conv(sd, "decoder.2"),
        _conv(sd, "decoder.4.conv"),
        _conv(sd, "decoder.6"),
    ]

    fp = {}
    for direction, tk in (("backward", "backward_"), ("forward", "forward_")):
        d = _conv(sd, f"feat_prop_module.deform_align.{tk}")
        d["conv_offset"] = [
            _conv(sd, f"feat_prop_module.deform_align.{tk}.conv_offset.{j}")
            for j in (0, 2, 4, 6)
        ]
        fp[direction] = {
            "deform": d,
            "backbone": [
                _conv(sd, f"feat_prop_module.backbone.{tk}.{j}")
                for j in (0, 2)
            ],
        }
    fp["fusion"] = _conv(sd, "feat_prop_module.fusion")
    p["feat_prop"] = fp

    c = 128
    k = 49
    p["ss"] = {"embedding": _patch_linear_in(sd, "ss.embedding", c, k)}
    sc = {"embedding": _patch_linear_out(sd, "sc.embedding", c, k)}
    if variant == "base":
        sc["bias"] = jnp.asarray(_t(sd["sc.bias"]).transpose(1, 2, 0))
    else:
        sc["bias_conv"] = _conv(sd, "sc.bias_conv")
    p["sc"] = sc

    blocks = []
    i = 0
    while f"transformer.{i}.norm1.weight" in sd:
        pre = f"transformer.{i}"
        blocks.append({
            "norm1": {"g": jnp.asarray(_t(sd[f"{pre}.norm1.weight"])),
                      "b": jnp.asarray(_t(sd[f"{pre}.norm1.bias"]))},
            "norm2": {"g": jnp.asarray(_t(sd[f"{pre}.norm2.weight"])),
                      "b": jnp.asarray(_t(sd[f"{pre}.norm2.bias"]))},
            "attn": {
                "qkv": _linear(sd, f"{pre}.attn.qkv"),
                "proj": _linear(sd, f"{pre}.attn.proj"),
            },
            "mlp": {
                "fc1": _patch_linear_out(sd, f"{pre}.mlp.conv1.0", 40, k),
                "fc2": _patch_linear_in(sd, f"{pre}.mlp.conv2.1", 40, k),
            },
            "pool": _linear(sd, f"{pre}.pool_layers.0"),
        })
        i += 1
    p["transformer"] = blocks

    p["spynet"] = convert_spynet(sd, "update_spynet.")
    return p


def convert_discriminator(sd):
    """T-PatchGAN discriminator state dict -> pytree (with SN u-state)."""
    convs, us = [], []
    for i, li in enumerate((0, 2, 4, 6, 8, 10)):
        if f"conv.{li}.weight_orig" in sd:
            w = _t(sd[f"conv.{li}.weight_orig"])
            convs.append({"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0))})
            us.append(jnp.asarray(_t(sd[f"conv.{li}.weight_u"])))
        else:
            w = _t(sd[f"conv.{li}.weight"])
            conv = {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}
            if f"conv.{li}.bias" in sd:
                conv["b"] = jnp.asarray(_t(sd[f"conv.{li}.bias"]))
            convs.append(conv)
            us.append(jnp.zeros((w.shape[0],), jnp.float32))
    return {"convs": convs, "u": us}


def load_torch_state_dict(path):
    """Deserialize a .pth; tolerates either a raw state dict or a wrapper."""
    import torch
    data = torch.load(path, map_location="cpu")
    if isinstance(data, dict) and "state_dict" in data:
        data = data["state_dict"]
    return data


def load_generator(path, variant="base"):
    return convert_generator(load_torch_state_dict(path), variant)


def load_discriminator(path):
    return convert_discriminator(load_torch_state_dict(path))


def load_spynet(path):
    """Standalone pretrained SPyNet (openmmlab release) for training."""
    return convert_spynet(load_torch_state_dict(path))
