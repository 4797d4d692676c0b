"""Generate whole-generator golden tensors from the REFERENCE torch model.

Runs the reference InpaintGenerator (model/e2fgvi.py:236-263 wiring,
executed from /root/reference under tests/mmcv_shim.py) with DETERMINISTIC
weights and input, and stores strided output slices + the weight-rebuild
protocol in tests/goldens/*.npz. tests/test_generator_golden.py then
rebuilds the same weights WITHOUT torch or the reference checkout, converts
them with convert/torch_loader.py, and asserts end-to-end parity of the
JAX generator — so any inter-module wiring mistake (flow argument order,
local/ref split, residual adds) fails against reference-produced numbers.

Weight protocol (shared with the test, keep in sync):
  keys = stored key order (sorted named_parameters of the reference model)
  norm{1,2}.weight -> 1 + 0.05*N ;  *.bias -> 0.02*N ;
  else 0.5/sqrt(fan_in)*N with fan_in = prod(shape[1:])
  with one np.random.default_rng(7) drawn sequentially over keys.
  (fan-in scaling keeps the tanh output unsaturated — a saturated golden
  would hide wiring errors.)

Run (one-time, needs /root/reference): PYTHONPATH=. python scripts/make_golden.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import mmcv_shim  # noqa: E402

mmcv_shim.install()
sys.path.insert(0, "/root/reference")

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def fill_weight(key, shape, rng):
    if key.endswith("norm1.weight") or key.endswith("norm2.weight"):
        return (1.0 + 0.05 * rng.standard_normal(shape)).astype(np.float32)
    if key.endswith(".bias"):
        return (0.02 * rng.standard_normal(shape)).astype(np.float32)
    fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else int(shape[0])
    return (0.5 / np.sqrt(fan_in)
            * rng.standard_normal(shape)).astype(np.float32)


def make(variant, module_name, t, lt, h, w):
    mod = __import__(module_name, fromlist=["InpaintGenerator"])
    model = mod.InpaintGenerator(init_weights=False).eval()

    keys = sorted(k for k, _ in model.named_parameters())
    shapes = [tuple(dict(model.named_parameters())[k].shape) for k in keys]
    rng = np.random.default_rng(7)
    sd = {k: torch.from_numpy(fill_weight(k, s, rng))
          for k, s in zip(keys, shapes)}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # strict=False tolerates only non-parameter buffers
    for m in missing:
        assert "valid_ind" in m or m.endswith(("mean", "std")), m

    in_rng = np.random.default_rng(11)
    frames = in_rng.uniform(-1, 1, (1, t, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        out, flows = model(torch.from_numpy(frames), lt)
    out = out.numpy()                                  # (t, 3, h, w)
    ff = flows[0].numpy()                              # (1, lt-1, 2, h/4, w/4)
    fb = flows[1].numpy()

    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"generator_{variant}.npz")
    np.savez_compressed(
        path,
        keys=np.array(keys), shapes=np.array([str(s) for s in shapes]),
        t=t, lt=lt, h=h, w=w,
        out_slice=out[:, :, ::5, ::7],
        flow_f_slice=ff[:, :, :, ::3, ::3],
        flow_b_slice=fb[:, :, :, ::3, ::3],
    )
    print(f"{variant}: wrote {path} "
          f"out_std={out.std():.4f} flow_std={ff.std():.4f}")
    return keys, shapes


if __name__ == "__main__":
    make("base", "model.e2fgvi", t=6, lt=5, h=240, w=432)
    make("hq", "model.e2fgvi_hq", t=5, lt=4, h=120, w=216)
