"""Training-step benchmark: jitted GAN step at the reference train config.

Times the full jitted train step (generator fwd + D update + G update, one
vjp) at the reference hot-loop geometry — global batch 8, T = 5 local + 3
reference frames, 432x240 (reference configs/train_e2fgvi.json:30-43,
core/trainer.py:293-399) — on the default JAX device and prints ONE JSON
line {"metric", "value", "unit", ...}.

Env knobs:
  E2FGVI_TRAIN_BENCH_BATCH=N   (default 1 = per-chip; reference global 8)
  E2FGVI_TRAIN_BENCH_DTYPE=float32|bfloat16 (default bfloat16 params/compute)
  E2FGVI_TRAIN_BENCH_REMAT=0|1 (default 1 — the production memory envelope)
  E2FGVI_TRAIN_BENCH_OUT=path  (also write the JSON line to a file)
"""

import json
import os

import numpy as np

from e2fgvi_tpu.utils import env


def main():
    os.environ.setdefault("E2FGVI_MATMUL_PRECISION", "default")
    env.setup()
    import jax
    import jax.numpy as jnp
    from e2fgvi_tpu.models import discriminator, e2fgvi
    from e2fgvi_tpu.train import step as step_lib
    from e2fgvi_tpu.utils.profiling import time_stage

    # per-CHIP batch: the reference's global batch 8 runs on 8 GPUs —
    # one sample per device (configs/train_e2fgvi.json:30-43 with 8-way
    # DDP). The full-batch-8 step needs ~67G of activations (measured),
    # which no single chip holds; data parallelism over a mesh is the
    # production path (parallel/mesh.py).
    batch = int(os.environ.get("E2FGVI_TRAIN_BENCH_BATCH", "1"))
    use_bf16 = os.environ.get("E2FGVI_TRAIN_BENCH_DTYPE",
                              "bfloat16") == "bfloat16"
    lt, n_ref, h, w = 5, 3, 240, 432
    t = lt + n_ref

    params_g = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
    params_d = discriminator.init_params(jax.random.PRNGKey(1))
    if use_bf16:
        cast = lambda x: (x.astype(jnp.bfloat16)  # noqa: E731
                          if hasattr(x, "astype") and x.dtype == jnp.float32
                          else x)
        params_g = jax.tree.map(cast, params_g)
        params_d = jax.tree.map(cast, params_d)

    tx_g, tx_d = step_lib.make_optimizers(1e-4, lambda s: 1e-4)
    state = step_lib.init_train_state(
        params_g, params_d, jax.tree.map(jnp.array, params_g["spynet"]),
        tx_g, tx_d)
    remat = os.environ.get("E2FGVI_TRAIN_BENCH_REMAT", "1") == "1"
    step_fn = jax.jit(step_lib.make_train_step(
        tx_g, tx_d, num_local_frames=lt,
        config_losses={"hole_weight": 1.0, "valid_weight": 1.0,
                       "flow_weight": 1.0, "adversarial_weight": 0.01},
        gan_type="hinge", remat=remat))

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(-1, 1, (batch, t, h, w, 3)).astype(np.float32))
    masks = jnp.asarray(
        (rng.uniform(0, 1, (batch, t, h, w, 1)) > 0.85).astype(np.float32))

    def one_step(state, frames, masks):
        new_state, logs = step_fn(state, frames, masks)
        return logs  # keep `state` constant across timed reps

    dt = time_stage(one_step, state, frames, masks, iters=4)
    line = {
        "metric": "train_step_sec_b%d_432x240" % batch,
        "value": round(dt, 4),
        "unit": "s/iteration",
        "iterations_per_sec": round(1.0 / dt, 3),
        "global_batch8_iterations_per_sec_8chip": round(1.0 / dt, 3),
        "dtype": "bfloat16" if use_bf16 else "float32",
        "remat": remat,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(line), flush=True)
    out = os.environ.get("E2FGVI_TRAIN_BENCH_OUT")
    if out:
        import datetime
        line["date"] = datetime.date.today().isoformat()
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "a") as f:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
