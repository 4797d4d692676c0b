"""Split softsplit/softcomp/decoder/F3N costs at the bench geometry (r04).

profile_r04: softsplit_comp_B 72 ms, decoder_local_B 76 ms — both far
above their MXU FLOP floors (~10 ms, ~8 ms). This isolates the pieces to
find the relayout/glue.

Run (TPU): PYTHONPATH=.:/root/.axon_site python scripts/exp_decparts_r04.py
"""

import os

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")

from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.models import e2fgvi, tfocal  # noqa: E402
from e2fgvi_tpu.ops.patches import fold  # noqa: E402
from e2fgvi_tpu.ops.resize import resize_scale2_aligned  # noqa: E402
from e2fgvi_tpu.ops.convs import conv2d  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, T, L = 14, 17, 11
HQ, WQ, C = 60, 108, 128
LH, LW, HID = 20, 36, 512
DT = jnp.bfloat16


def main():
    rng = np.random.default_rng(0)
    params = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
    params = jax.tree.map(
        lambda x: x.astype(DT)
        if hasattr(x, "astype") and x.dtype == jnp.float32 else x, params)

    feat = jnp.asarray(rng.standard_normal((B * T, HQ, WQ, C)), DT)
    feat_l = jnp.asarray(rng.standard_normal((B * L, HQ, WQ, C)), DT)
    tokens = jnp.asarray(rng.standard_normal((B, L, LH, LW, HID)), DT)
    patches = jnp.asarray(
        rng.standard_normal((B * L, LH, LW, 7, 7, C)), DT)
    x1 = jnp.asarray(rng.standard_normal((B * L, HQ, WQ, C)), DT)
    x2 = jnp.asarray(rng.standard_normal((B * L, 2 * HQ, 2 * WQ, 64)), DT)
    xtok = jnp.asarray(rng.standard_normal((B, T, LH, LW, HID)), DT)

    pieces = [
        ("soft_split (BT=238)", lambda p, z: tfocal.soft_split(
            p["ss"], z, B), (params, feat)),
        ("soft_comp (BL=154)", lambda p, z: tfocal.soft_comp(
            p["sc"], z, L, (HQ, WQ)), (params, tokens)),
        ("sc embedding GEMM only", lambda p, z: jnp.einsum(
            "btyxh,ho->btyxo", z, p["sc"]["embedding"]["w"]),
         (params, tokens)),
        ("fold only (154 frames)", lambda z: fold(
            z, (HQ, WQ), (7, 7), (3, 3), (3, 3)), (patches,)),
        ("decode (BL=154)", lambda p, z: e2fgvi.decode(p["decoder"], z),
         (params, feat_l)),
        ("resize2x (60->120)", lambda z: resize_scale2_aligned(z), (x1,)),
        ("resize2x (120->240)", lambda z: resize_scale2_aligned(z), (x2,)),
        ("f3n conv-form (T=17)", lambda p, z: tfocal._fusion_feed_forward_conv(
            p["transformer"][0]["mlp"], z.reshape(B, T * LH * LW, HID), T,
            (HQ, WQ)), (params, xtok)),
        ("f3n gemm-form (T=17)", lambda p, z: tfocal.fusion_feed_forward(
            p["transformer"][0]["mlp"], z.reshape(B, T * LH * LW, HID), T,
            (HQ, WQ)), (params, xtok)),
    ]
    for name, fn, args in pieces:
        try:
            dt = time_stage(jax.jit(fn), *args, iters=6)
            print(f"{name:28s} {dt * 1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED {type(e).__name__}: "
                  + " | ".join(str(e).splitlines()[:1]), flush=True)


if __name__ == "__main__":
    main()
