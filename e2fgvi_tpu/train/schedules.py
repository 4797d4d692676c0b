"""LR schedules: multi-step (with restarts) and cosine-annealing restarts.

Functional equivalents of reference core/lr_scheduler.py (BasicSR-style),
stepped per iteration (the reference steps its schedulers every training
iteration, core/trainer.py:366). Implemented with jnp ops so the schedule
can run on a traced step counter inside the jitted train step.
"""

import numpy as np
import jax.numpy as jnp


def multistep_restart_lr(base_lr, milestones, gamma=0.1, restarts=(0,),
                         restart_weights=(1.0,)):
    """Returns lr(step). Matches MultiStepRestartLR (lr_scheduler.py:9-47)."""
    milestones = sorted(int(m) for m in milestones)
    restarts = tuple(int(r) for r in restarts)

    def lr(step):
        step = jnp.asarray(step)
        w = jnp.asarray(1.0)
        for r, rw in zip(restarts, restart_weights):
            w = jnp.where(step >= r, rw, w)
        cur = base_lr * w
        for m in milestones:
            cur = cur * jnp.where(step >= m, gamma, 1.0)
        return cur

    return lr


def cosine_annealing_restart_lr(base_lr, periods, restart_weights=(1.0,),
                                eta_min=1e-7):
    """Matches CosineAnnealingRestartLR (lr_scheduler.py:68-112)."""
    cumulative = np.asarray(
        [sum(periods[: i + 1]) for i in range(len(periods))])
    periods_arr = jnp.asarray(np.asarray(periods, np.float32))
    weights_arr = jnp.asarray(np.asarray(restart_weights, np.float32))
    starts = jnp.asarray(
        np.concatenate([[0], cumulative[:-1]]).astype(np.float32))
    cum = jnp.asarray(cumulative.astype(np.float32))

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.clip(jnp.sum(step > cum), 0, len(periods) - 1)
        w = jnp.take(weights_arr, idx)
        nearest = jnp.take(starts, idx)
        period = jnp.take(periods_arr, idx)
        return (eta_min + w * 0.5 * (base_lr - eta_min) *
                (1 + jnp.cos(jnp.pi * (step - nearest) / period)))

    return lr


def make_schedule(config_sched: dict, base_lr: float):
    """Build an lr(step) callable from a reference-style JSON scheduler
    config (configs/train_e2fgvi.json 'trainer.scheduler')."""
    kind = config_sched["type"]
    if kind in ("MultiStepLR", "MultiStepRestartLR"):
        return multistep_restart_lr(base_lr,
                                    config_sched["milestones"],
                                    config_sched.get("gamma", 0.1))
    if kind == "CosineAnnealingRestartLR":
        return cosine_annealing_restart_lr(
            base_lr, config_sched["periods"],
            tuple(config_sched.get("restart_weights", (1.0,))))
    raise NotImplementedError(f"Scheduler {kind} is not implemented")
