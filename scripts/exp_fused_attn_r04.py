"""A/B the round-4 fused focal attention (gather layout + Pallas kernel)
against the round-3 slice-assembly + flash path at the bench geometry
(B=14, T=17, 20x36 tokens, bf16).

r03 baseline (results/exp_tfocal_b14_r03.txt):
  key_assembly(k+v)   35.64 ms   attention_flash(core) 19.87 ms
  window_attention    53.39 ms   block_full            69.30 ms

Run (TPU): PYTHONPATH=. python scripts/exp_fused_attn_r04.py
"""

import os

import numpy as np

os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")

from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e2fgvi_tpu.models import tfocal  # noqa: E402
from e2fgvi_tpu.utils.profiling import time_stage  # noqa: E402

B, T, HH, WW, C = 14, 17, 20, 36, 512
HEADS, WIN, FL = 4, (5, 9), 2
EXP = (WIN[0] // 2, WIN[1] // 2)
OUT = (60, 108)
DT = jnp.bfloat16

rng = np.random.default_rng(0)
params = tfocal.init_block_params(jax.random.PRNGKey(0), C, WIN, dtype=DT)
x = jnp.asarray(rng.standard_normal((B, T, HH, WW, C)), DT)


def t(name, fn, *args):
    try:
        dt = time_stage(jax.jit(fn), *args, iters=4)
        print(f"{name:36s} {dt * 1e3:8.2f} ms  (x8 blocks = "
              f"{dt * 8e3:7.1f} ms)", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        print(f"{name:36s} FAILED {type(e).__name__}: "
              + " | ".join(str(e).splitlines()[:1]), flush=True)
        return None


pooled = jax.jit(lambda p, z: tfocal._pool_level(p, z, WIN))(params, x)


def attn(p, z, pz):
    return tfocal.window_attention(p["attn"], z, pz, HEADS, WIN, EXP)


def fused_full(p, z, pz):
    # public dispatch (E2FGVI_ATTENTION=fused set below)
    return tfocal.window_attention(p["attn"], z, pz, HEADS, WIN, EXP)


# baseline (round-3 default path)
os.environ["E2FGVI_ATTENTION"] = "flash"
t("window_attention(flash,r03)", attn, params, x, pooled)
os.environ["E2FGVI_ATTENTION"] = "fused"

t("window_attention(fused)", fused_full, params, x, pooled)

# whole block / stack with the fused backend
t("block_full(fused)", lambda p, z: tfocal.transformer_block(
    p, z, OUT, HEADS, WIN, FL), params, x)
stacked8 = [params] * 8
t("stack8_scan(fused)", lambda ps, z: tfocal.transformer_stack(
    ps, z, OUT, HEADS, WIN, FL), stacked8, x)

# numerical parity vs the XLA reference formulation
os.environ["E2FGVI_ATTENTION"] = "xla"
ref = jax.jit(attn)(params, x, pooled)
os.environ["E2FGVI_ATTENTION"] = "fused"
got = jax.jit(fused_full)(params, x, pooled)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                            - ref.astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
print(f"parity max|fused-xla| = {err:.3e}  (rel {err / scale:.3e})",
      flush=True)
