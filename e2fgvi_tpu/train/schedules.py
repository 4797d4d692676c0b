"""LR schedules: multi-step (with restarts) and cosine-annealing restarts.

Functional equivalents of reference core/lr_scheduler.py (BasicSR-style),
stepped per iteration (the reference steps its schedulers every training
iteration, core/trainer.py:366)."""

import math


def multistep_restart_lr(base_lr, milestones, gamma=0.1, restarts=(0,),
                         restart_weights=(1.0,)):
    """Returns lr(step). Matches MultiStepRestartLR (lr_scheduler.py:9-47)."""
    milestones = sorted(int(m) for m in milestones)
    restarts = tuple(int(r) for r in restarts)

    def lr(step: int) -> float:
        cur = base_lr
        last_restart_w = 1.0
        for i, r in enumerate(restarts):
            if step >= r:
                last_restart_w = restart_weights[i]
        cur = base_lr * last_restart_w
        for m in milestones:
            if step >= m:
                cur *= gamma
        return cur

    return lr


def cosine_annealing_restart_lr(base_lr, periods, restart_weights=(1.0,),
                                eta_min=1e-7):
    """Matches CosineAnnealingRestartLR (lr_scheduler.py:68-112)."""
    cumulative = [sum(periods[: i + 1]) for i in range(len(periods))]

    def lr(step: int) -> float:
        idx = next((i for i, p in enumerate(cumulative) if step <= p),
                   len(cumulative) - 1)
        w = restart_weights[idx]
        nearest = 0 if idx == 0 else cumulative[idx - 1]
        period = periods[idx]
        return (eta_min + w * 0.5 * (base_lr - eta_min) *
                (1 + math.cos(math.pi * (step - nearest) / period)))

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
