"""Device mesh + sharding helpers.

Replaces the reference's NCCL/DDP plumbing (train.py:29-35,
core/trainer.py:70-81, core/dist.py) with JAX-native SPMD:

- one `Mesh` over all chips with axes ('data', 'model'),
- batch sharded on 'data' (the reference's DistributedSampler + DDP
  all-reduce become a NamedSharding constraint; XLA emits the gradient
  psum over ICI),
- optionally, the transformer's wide GEMMs (qkv/proj/fc1/fc2 and the token
  embeddings) sharded on 'model' for tensor parallelism — something the
  reference has no analog for.

Multi-host: call `initialize_distributed()` once per process (JAX
coordination service replaces the reference's PMI/OpenMPI/Azure env-var
rendezvous, core/dist.py:5-47).
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def detect_world():
    """(num_processes, process_id) from scheduler env vars.

    Mirrors the reference's PMI / OpenMPI discovery (core/dist.py:5-26),
    plus the explicit E2FGVI_* overrides."""
    size = os.environ.get("E2FGVI_NUM_PROCESSES") or \
        os.environ.get("PMI_SIZE") or \
        os.environ.get("OMPI_COMM_WORLD_SIZE") or "1"
    rank = os.environ.get("E2FGVI_PROCESS_ID") or \
        os.environ.get("PMI_RANK") or \
        os.environ.get("OMPI_COMM_WORLD_RANK") or "0"
    return int(size), int(rank)


def coordinator_address(default_port=23455):
    """Coordinator host:port (reference get_master_ip, core/dist.py:41-47)."""
    if os.environ.get("E2FGVI_COORDINATOR"):
        return os.environ["E2FGVI_COORDINATOR"]
    host = None
    if os.environ.get("AZ_BATCH_MASTER_NODE"):
        host = os.environ["AZ_BATCH_MASTER_NODE"].split(":")[0]
    elif os.environ.get("AZ_BATCHAI_MPI_MASTER_NODE"):
        host = os.environ["AZ_BATCHAI_MPI_MASTER_NODE"]
    else:
        host = "127.0.0.1"
    return f"{host}:{default_port}"


def initialize_distributed():
    """Multi-host init (replaces torch.distributed init_process_group +
    NCCL rendezvous, reference train.py:29-35); no-op on a single host."""
    size, rank = detect_world()
    if size > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address(),
            num_processes=size, process_id=rank)


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch with the batch dim sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def generator_param_sharding(mesh: Mesh, params):
    """NamedSharding pytree for generator params: transformer GEMMs sharded
    on 'model' (output dim), everything else replicated.

    With model=1 this degenerates to full replication (pure DP)."""
    repl = replicated(mesh)
    shard_out = NamedSharding(mesh, P(None, "model"))
    shard_in = NamedSharding(mesh, P("model", None))

    def assign(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "transformer" in keys:
            if "qkv" in keys or "fc1" in keys:
                if keys[-1] == "w":
                    return shard_out
                return NamedSharding(mesh, P("model")) if leaf.ndim == 1 \
                    else repl
            if "proj" in keys or "fc2" in keys:
                if keys[-1] == "w":
                    return shard_in
                return repl
        return repl

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(mesh: Mesh, params, sharding_tree=None):
    if sharding_tree is None:
        sharding_tree = generator_param_sharding(mesh, params)
    return jax.tree.map(jax.device_put, params, sharding_tree)


def global_batch_array(sharding: NamedSharding, local_batch):
    """Assemble a global, 'data'-sharded array from per-process host shards.

    Reference semantics: DistributedSampler hands each rank
    batch/world_size items and DDP all-reduces grads
    (core/trainer.py:35-45); here each process contributes the shard its
    loader decoded and XLA sees ONE global array. Single-process (incl. the
    virtual CPU mesh) degenerates to a plain sharded device_put."""
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
