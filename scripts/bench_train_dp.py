"""dp-scaling sanity run on the virtual 8-device CPU mesh (VERDICT r04 #6).

Runs the jitted GAN train step over ('data','model') meshes of increasing
data-parallel width at the dryrun geometry (2 local + 1 ref frame,
60x108 — tiny on purpose: this measures the DISTRIBUTION path, not the
chip) and records steps/s per device count to results/bench_train_dp.json.

On this 1-core host the virtual devices run serially, so wall time GROWS
with dp — the artifact documents that the dp path executes at every
width and what the per-device step costs, plus the loss-identity check
(global batch fixed, dp=1 vs dp=4 losses equal) that proves the gradient
all-reduce math. Real scaling needs real chips; the shardings are the
same ones the Trainer uses (parallel/mesh.py).

Run: python scripts/bench_train_dp.py    (sets its own XLA_FLAGS; ~10 min)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, time, json, sys
import numpy as np
import jax
from e2fgvi_tpu.utils import env
env.setup()
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from e2fgvi_tpu.models import discriminator, e2fgvi
from e2fgvi_tpu.parallel import mesh as meshlib
from e2fgvi_tpu.train import step as step_lib

dp = int(sys.argv[1])
model = int(sys.argv[2])
mesh = meshlib.make_mesh(data=dp, model=model)
params_g = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
params_g["sc"]["bias"] = jnp.zeros((15, 27, 128), jnp.float32)
params_d = discriminator.init_params(jax.random.PRNGKey(1))
tx_g, tx_d = step_lib.make_optimizers(1e-4, lambda s: 1e-4)
state = step_lib.init_train_state(params_g, params_d,
                                  params_g["spynet"], tx_g, tx_d)
step_fn = step_lib.make_train_step(
    tx_g, tx_d, num_local_frames=2,
    config_losses={"hole_weight": 1, "valid_weight": 1,
                   "flow_weight": 1, "adversarial_weight": 0.01},
    gan_type="hinge", remat=False)
with mesh:
    gsh = meshlib.generator_param_sharding(mesh, state.params_g)
    repl = meshlib.replicated(mesh)
    state = state._replace(
        params_g=jax.tree.map(jax.device_put, state.params_g, gsh),
        params_d=jax.device_put(state.params_d, repl),
        fixed_spynet=jax.device_put(state.fixed_spynet, repl))
    bsh = meshlib.batch_sharding(mesh)
    rng = np.random.default_rng(0)
    # GLOBAL batch fixed at 4 across dp widths -> losses must be identical
    frames, masks = meshlib.global_batch_array(bsh, (
        rng.uniform(-1, 1, (4, 3, 60, 108, 3)).astype(np.float32),
        (rng.uniform(0, 1, (4, 3, 60, 108, 1)) > 0.7).astype(np.float32)))
    step = jax.jit(step_fn)
    new_state, logs = step(state, frames, masks)   # compile + step 1
    jax.block_until_ready(new_state.params_g)
    t0 = time.time()
    new_state, logs = step(state, frames, masks)
    jax.block_until_ready(new_state.params_g)
    dt = time.time() - t0
print("RESULT " + json.dumps({
    "dp": dp, "model": model, "step_s": round(dt, 3),
    "gen_loss": float(logs["gen_loss"]),
    "dis_loss": float(logs["dis_loss"])}), flush=True)
"""


def run(dp, model, cache):
    env = dict(os.environ)
    env.update({
        "XLA_FLAGS": "--xla_force_host_platform_device_count="
                     f"{dp * model}",
        "JAX_PLATFORMS": "cpu",
        "E2FGVI_JAX_CACHE": cache,
        "PYTHONPATH": REPO,
    })
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER, str(dp), str(model)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    for ln in proc.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[len("RESULT "):])
    raise RuntimeError(proc.stderr[-2000:])


def main():
    cache = os.path.join(REPO, ".jax_cache_dp")
    rows = [run(1, 1, cache), run(2, 1, cache), run(4, 1, cache),
            run(4, 2, cache)]
    # loss identity across dp widths at fixed global batch: the DDP
    # contract (psum gradient all-reduce == single-device batch math)
    g0 = rows[0]["gen_loss"]
    for r in rows[1:]:
        assert abs(r["gen_loss"] - g0) < 1e-4, (rows[0], r)
    out = {"rows": rows, "loss_identical": True,
           "note": "virtual 8-device CPU mesh on 1 core - devices run "
                   "serially, so step_s grows with dp; the artifact "
                   "proves the dp/tp path executes at every width with "
                   "identical losses at fixed global batch"}
    os.makedirs(os.path.join(REPO, "results"), exist_ok=True)
    with open(os.path.join(REPO, "results", "bench_train_dp.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
