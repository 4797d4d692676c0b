"""Checkpoint save/load: orbax pytrees + the reference's latest-pointer.

Replaces the reference's three-file torch scheme (gen/dis/opt .pth +
latest.ckpt text pointer, core/trainer.py:170-262) with orbax checkpoints:
one directory per iteration holding {gen, dis, opt_state, meta}, plus a
`latest` text file. Only process index 0 writes (multi-host safe).
"""

import os

import jax
import orbax.checkpoint as ocp


def save_pytree(path, tree):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path, target=None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target)
    return ckptr.restore(path)


class TrainCheckpointer:
    """Iteration-addressed training checkpoints with resume discovery."""

    def __init__(self, save_dir):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)

    def _it_dir(self, it):
        return os.path.join(self.save_dir, f"it_{it:08d}")

    def save(self, it, state_tree):
        if jax.process_index() != 0:
            return
        save_pytree(self._it_dir(it), state_tree)
        with open(os.path.join(self.save_dir, "latest"), "w") as f:
            f.write(str(it))

    def latest_iteration(self):
        latest = os.path.join(self.save_dir, "latest")
        if os.path.isfile(latest):
            with open(latest) as f:
                return int(f.read().strip().splitlines()[-1])
        its = [int(d.split("_")[1]) for d in os.listdir(self.save_dir)
               if d.startswith("it_")]
        return max(its) if its else None

    def restore(self, target=None, it=None):
        if it is None:
            it = self.latest_iteration()
        if it is None:
            return None, None
        return load_pytree(self._it_dir(it), target), it
