"""Worker for the two-process distributed smoke test.

Run by tests/test_distributed.py as a subprocess:
    python tests/dist_worker.py <rank> <nprocs> <port> <outdir>

Exercises the REAL multi-host path (parallel/mesh.py): world discovery
from E2FGVI_* env vars, `initialize_distributed` (JAX coordination
service — the reference's NCCL/TCP rendezvous, train.py:29-35), a
('data','model') mesh over all processes' devices, per-process batch
shards assembled with `global_batch_array` (the reference's
DistributedSampler semantics), and ONE GAN train step whose gradient
all-reduce XLA emits. Writes the step's scalar logs + a generator-param
checksum to <outdir>/logs_<rank>.json.

nprocs=1 runs the identical step single-process (the reference
semantics baseline the test compares against).
"""

import json
import os
import sys


def main():
    rank, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)   # 1 CPU device per process
    if nprocs > 1:
        os.environ["E2FGVI_NUM_PROCESSES"] = str(nprocs)
        os.environ["E2FGVI_PROCESS_ID"] = str(rank)
        os.environ["E2FGVI_COORDINATOR"] = f"127.0.0.1:{port}"

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    from e2fgvi_tpu.parallel import mesh as meshlib

    meshlib.initialize_distributed()      # no-op at nprocs=1

    import numpy as np
    import jax.numpy as jnp
    from e2fgvi_tpu.models import discriminator, e2fgvi
    from e2fgvi_tpu.train import step as step_lib

    assert jax.process_count() == nprocs, (jax.process_count(), nprocs)

    params_g = e2fgvi.init_params(jax.random.PRNGKey(0), variant="base")
    params_g["sc"]["bias"] = jnp.zeros((15, 27, 128), jnp.float32)
    params_d = discriminator.init_params(jax.random.PRNGKey(1))
    tx_g, tx_d = step_lib.make_optimizers(1e-4, lambda s: 1e-4,
                                          spynet_lr_mult=0.5)
    state = step_lib.init_train_state(params_g, params_d,
                                      params_g["spynet"], tx_g, tx_d)
    losses = {"hole_weight": 1, "valid_weight": 1, "flow_weight": 1,
              "adversarial_weight": 0.01}
    # no_dis trims the compile; the D path is covered single-process by
    # tests/test_train_step.py
    step_fn = step_lib.make_train_step(tx_g, tx_d, 3, losses, no_dis=True)

    rng = np.random.default_rng(0)
    gb = 2                                       # global batch
    frames = rng.uniform(-1, 1, (gb, 4, 60, 108, 3)).astype(np.float32)
    masks = (rng.uniform(0, 1, (gb, 4, 60, 108, 1)) > 0.7).astype(
        np.float32)

    mesh = meshlib.make_mesh()                   # all processes' devices
    with mesh:
        repl = meshlib.replicated(mesh)
        st = state._replace(
            params_g=jax.device_put(state.params_g, repl),
            params_d=jax.device_put(state.params_d, repl),
            fixed_spynet=jax.device_put(state.fixed_spynet, repl))
        bs = meshlib.batch_sharding(mesh)
        per = gb // nprocs
        lo = rank * per
        batch = meshlib.global_batch_array(
            bs, {"frames": frames[lo: lo + per],
                 "masks": masks[lo: lo + per]})
        s1, logs = jax.jit(step_fn, out_shardings=(None, repl))(
            st, batch["frames"], batch["masks"])
        out = {k: float(v) for k, v in logs.items()}
        psum_fn = jax.jit(
            lambda p: sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                          for x in jax.tree_util.tree_leaves(p)),
            out_shardings=repl)
        out["param_sum"] = float(psum_fn(s1.params_g))

    if rank == 0:
        with open(os.path.join(outdir, f"logs_{nprocs}proc.json"),
                  "w") as f:
            json.dump(out, f)
    print(f"[worker {rank}/{nprocs}] done: {out}", flush=True)


if __name__ == "__main__":
    main()
