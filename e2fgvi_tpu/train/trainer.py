"""Training runtime: data, optimizers, pjit step, checkpoints, logging.

The framework's equivalent of reference core/trainer.py (Trainer) and
train.py (launcher), TPU-native:

- SPMD over a ('data','model') Mesh; batch sharded on 'data'; gradient
  all-reduce emitted by XLA (no DDP/NCCL plumbing).
- One jit-compiled train step (see train/step.py) instead of an eager loop.
- orbax checkpoints (gen/dis/opt/meta in one tree) + `latest` pointer; the
  resume path restores iteration count, optimizer state and SN u-state.
- Config: the same JSON schema as the reference (configs/train_e2fgvi.json)
  — and the 'seed' key is actually honored here (the reference defines it
  but never uses it, SURVEY.md §8.1).
"""

import json
import logging
import os
import time

import jax
import jax.numpy as jnp

from e2fgvi_tpu.data.datasets import TrainDataset, PrefetchLoader
from e2fgvi_tpu.models import discriminator, e2fgvi
from e2fgvi_tpu.parallel import mesh as meshlib
from e2fgvi_tpu.train import schedules, step as step_lib
from e2fgvi_tpu.utils.checkpoints import TrainCheckpointer

log = logging.getLogger("e2fgvi_tpu.train")


class Trainer:
    def __init__(self, config: dict, mesh=None, spynet_pretrained=None):
        self.config = config
        self.lt = config["train_data_loader"]["num_local_frames"]
        tr = config["trainer"]
        self.iterations = int(tr["iterations"])
        self.save_freq = int(tr.get("save_freq", 5000))
        self.log_freq = int(tr.get("log_freq", 100))
        self.no_dis = bool(config["model"].get("no_dis", 0))
        self.gan_type = config["losses"].get("GAN_LOSS", "hinge")
        seed = int(config.get("seed", 2021))

        mp = int(tr.get("model_parallel", 1))
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(model=mp)
        n_data = self.mesh.shape["data"]
        global_batch = int(tr["batch_size"])
        assert global_batch % n_data == 0, (global_batch, n_data)
        self.global_batch = global_batch
        # per-process share of the global batch (the reference's
        # DistributedSampler split, core/trainer.py:35-45)
        self.n_proc = jax.process_count()
        self.proc_idx = jax.process_index()
        assert global_batch % self.n_proc == 0, (global_batch, self.n_proc)
        self.local_batch = global_batch // self.n_proc

        self.dataset = TrainDataset(config["train_data_loader"], seed=seed)
        self.num_workers = int(tr.get("num_workers", 2))

        # models
        key = jax.random.PRNGKey(seed)
        kg, kd, ks = jax.random.split(key, 3)
        variant = "hq" if config["model"]["net"] == "e2fgvi_hq" else "base"
        params_g = e2fgvi.init_params(kg, variant=variant)
        params_d = discriminator.init_params(kd)
        if spynet_pretrained is not None:
            params_g["spynet"] = spynet_pretrained
        # the frozen flow-loss SPyNet starts as a copy of the trainable one
        # (distinct buffers: the train step donates its input state)
        fixed = jax.tree.map(jnp.array, params_g["spynet"])

        base_lr = float(tr["lr"])
        sched_cfg = dict(tr["scheduler"])
        lr_fn = schedules.make_schedule(sched_cfg, base_lr)
        self.tx_g, self.tx_d = step_lib.make_optimizers(
            base_lr, lr_fn, spynet_lr_mult=float(tr.get("spynet_lr", 1.0)),
            beta1=float(tr.get("beta1", 0.0)),
            beta2=float(tr.get("beta2", 0.99)))
        self.lr_fn = lr_fn

        # Place parameters on the mesh BEFORE optimizer init: transformer
        # GEMMs sharded on 'model' (tensor parallelism; replication when
        # model_parallel == 1), everything else replicated. optax zeros_like
        # then inherits the shardings, so optimizer moments are born with
        # the same layout and the jitted step never reshards.
        with self.mesh:
            params_g = meshlib.shard_params(self.mesh, params_g)
            repl = meshlib.replicated(self.mesh)
            params_d = jax.device_put(params_d, repl)
            fixed = jax.device_put(fixed, repl)
        self.state = step_lib.init_train_state(params_g, params_d, fixed,
                                               self.tx_g, self.tx_d)

        self.ckpt = TrainCheckpointer(config["save_dir"])
        restored, it = self.ckpt.restore(target=self.state)
        if restored is not None:
            self.state = restored
            log.info("resumed from iteration %d", it)

        raw_step = step_lib.make_train_step(
            self.tx_g, self.tx_d, self.lt, config["losses"],
            no_dis=self.no_dis, gan_type=self.gan_type)
        self._step = jax.jit(raw_step, donate_argnums=0)
        self._batch_sharding = meshlib.batch_sharding(self.mesh)

        # TensorBoard scalars (rank 0), bucket-averaged like the reference
        # add_summary (core/trainer.py:161-168)
        self.writer = None
        self._summary_acc = {}
        if jax.process_index() == 0:
            from e2fgvi_tpu.utils.tb import SummaryWriter
            self.writer = SummaryWriter(
                os.path.join(config["save_dir"], "tb"))

    @property
    def iteration(self):
        return int(self.state.step)

    def train(self, max_steps=None, log_every=None):
        """Run the training loop until `iterations` (or max_steps more)."""
        target = self.iterations if max_steps is None else (
            self.iteration + max_steps)
        log_every = log_every or self.log_freq
        epoch = 0
        t0 = time.time()
        while self.iteration < target:
            epoch += 1
            loader = PrefetchLoader(
                self.dataset, batch_size=self.local_batch,
                num_workers=self.num_workers, shuffle=True,
                seed=int(self.config.get("seed", 2021)), epoch=epoch,
                shard_index=self.proc_idx, num_shards=self.n_proc)
            for frames, masks, _ in loader:
                frames, masks = meshlib.global_batch_array(
                    self._batch_sharding, (frames, masks))
                self.state, logs = self._step(self.state, frames, masks)
                it = self.iteration
                if self.writer is not None:
                    for k, v in logs.items():
                        self._summary_acc[k] = (
                            self._summary_acc.get(k, 0.0) + float(v))
                    if it % 100 == 0:
                        for k, v in self._summary_acc.items():
                            self.writer.add_scalar(f"loss/{k}", v / 100, it)
                        self._summary_acc = {}
                if it % log_every == 0:
                    vals = {k: float(v) for k, v in logs.items()}
                    rate = log_every / max(time.time() - t0, 1e-9)
                    t0 = time.time()
                    log.info("[it %d] %s | lr %.2e | %.2f it/s", it,
                             " ".join(f"{k}={v:.4f}"
                                      for k, v in sorted(vals.items())),
                             self.lr_fn(it), rate)
                if it % self.save_freq == 0:
                    self.ckpt.save(it, self.state)
                if it >= target:
                    break
        return self.state


def main(argv=None):
    import argparse
    from e2fgvi_tpu.utils import env
    env.setup()
    parser = argparse.ArgumentParser(description="E2FGVI-TPU training")
    parser.add_argument("-c", "--config", required=True,
                        help="JSON config (reference schema)")
    parser.add_argument("--spynet_ckpt", default=None,
                        help="pretrained SPyNet .pth (torch)")
    parser.add_argument("--max_steps", type=int, default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    with open(args.config) as f:
        config = json.load(f)
    config["save_dir"] = os.path.join(
        config.get("save_dir", "release_model/"),
        "{}_{}".format(config["model"]["net"],
                       os.path.basename(args.config).split(".")[0]))

    meshlib.initialize_distributed()
    pretrained = None
    if args.spynet_ckpt:
        from e2fgvi_tpu.convert.torch_loader import load_spynet
        pretrained = load_spynet(args.spynet_ckpt)
    trainer = Trainer(config, spynet_pretrained=pretrained)
    trainer.train(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
