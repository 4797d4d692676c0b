"""The jitted GAN training step (generator + discriminator, one update each).

Reproduces the reference iteration semantics (core/trainer.py:293-366) with
exactly one generator forward and one backward per step:

1. generator forward via `jax.vjp` (pullback saved),
2. discriminator hinge update on (real, stop_grad(composite)),
3. generator losses (adv vs the *updated* D — reference order — + flow +
   hole/valid L1) differentiated w.r.t. (pred, flows) and pulled back
   through the saved vjp,
4. optax adam(beta1=0, beta2=0.99) updates with per-iteration LR schedule
   and the spynet LR multiplier (reference setup_optimizers,
   core/trainer.py:93-123).

The step is pure: state in, state out — pjit-able over a ('data','model')
mesh with batch sharded on 'data' (gradient all-reduce is XLA's psum).
"""


from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import optax

from e2fgvi_tpu.models import discriminator as disc
from e2fgvi_tpu.models.e2fgvi import generator_forward
from e2fgvi_tpu.train import losses


class TrainState(NamedTuple):
    params_g: Any
    params_d: Any
    fixed_spynet: Any
    opt_g: Any
    opt_d: Any
    step: Any  # int32 scalar


def _spynet_mask(params):
    """True exactly on the trainable-SPyNet subtree (gets lr * spynet_lr)."""
    return {k: jax.tree.map(lambda _: (k == "spynet"), v)
            for k, v in params.items()}


def make_optimizers(base_lr, schedule_fn, spynet_lr_mult=1.0,
                    beta1=0.0, beta2=0.99):
    """schedule_fn: step -> lr (absolute, already includes base_lr)."""

    def sched(step):
        return schedule_fn(step)

    tx_g = optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2),
        optax.masked(optax.scale(spynet_lr_mult), _spynet_mask),
        optax.scale_by_schedule(lambda s: -sched(s)),
    )
    tx_d = optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2),
        optax.scale_by_schedule(lambda s: -sched(s)),
    )
    return tx_g, tx_d


def make_train_step(tx_g, tx_d, num_local_frames, config_losses,
                    no_dis=False, gan_type="hinge", remat=True):
    """remat: rematerialize the generator forward in its backward
    (jax.checkpoint inside generator_forward) — the memory/compute knob
    for real training (default on, matching the reference's memory
    envelope at batch 8 x 240x432). The multichip dryrun turns it off:
    on the driver's 1-core virtual CPU mesh the recompute is pure wall
    time with no memory to save."""
    hole_w = config_losses.get("hole_weight", 1.0)
    valid_w = config_losses.get("valid_weight", 1.0)
    flow_w = config_losses.get("flow_weight", 1.0)
    adv_w = config_losses.get("adversarial_weight", 0.01)
    lt = num_local_frames

    def step_fn(state: TrainState, frames, masks):
        """frames: (B, T, H, W, 3) in [-1,1]; masks: (B, T, H, W, 1)."""
        b, t, h, w, _ = frames.shape
        masked = frames * (1.0 - masks)
        gt_local = (frames[:, :lt] + 1.0) / 2.0

        # -- 1. generator forward with saved pullback
        def g_fwd(pg):
            pred, flows = generator_forward(pg, masked, lt, remat=remat)
            return pred.reshape(b, t, h, w, 3), flows

        (pred_imgs, pred_flows), g_vjp = jax.vjp(g_fwd, state.params_g)
        comp = frames * (1.0 - masks) + masks * pred_imgs

        logs = {}
        params_d = state.params_d
        opt_d = state.opt_d

        if not no_dis:
            # -- 2. discriminator update (real + detached fake)
            comp_sg = jax.lax.stop_gradient(comp)

            def d_loss_fn(pd):
                real_logits, pd1 = disc.apply(pd, frames, update_stats=True,
                                              use_sigmoid=gan_type != "hinge")
                fake_logits, pd2 = disc.apply(
                    {"convs": pd["convs"], "u": pd1["u"]}, comp_sg,
                    update_stats=True, use_sigmoid=gan_type != "hinge")
                d_real = losses.adversarial_loss(real_logits, True, True,
                                                 gan_type)
                d_fake = losses.adversarial_loss(fake_logits, False, True,
                                                 gan_type)
                return (d_real + d_fake) / 2.0, (pd2["u"], d_real, d_fake)

            (d_loss, (new_u, d_real, d_fake)), d_grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(params_d))
            d_updates, opt_d = tx_d.update(d_grads, state.opt_d, params_d)
            params_d = optax.apply_updates(params_d, d_updates)
            params_d = {"convs": params_d["convs"], "u": new_u}
            logs.update(dis_loss=d_loss, dis_real=d_real, dis_fake=d_fake)

        # -- 3. generator losses as a function of (pred, flows)
        def g_loss_fn(pred, flows):
            gen_loss = 0.0
            aux = {}
            if not no_dis:
                comp_live = frames * (1.0 - masks) + masks * pred
                gen_logits, pd3 = disc.apply(
                    params_d, comp_live, update_stats=True,
                    use_sigmoid=gan_type != "hinge")
                gan_loss = adv_w * losses.adversarial_loss(
                    gen_logits, True, False, gan_type)
                gen_loss += gan_loss
                aux["gan_loss"] = gan_loss
                aux["_u"] = pd3["u"]
            flow_loss = flow_w * losses.flow_completion_loss(
                state.fixed_spynet, flows, gt_local)
            hole, valid = losses.hole_valid_losses(pred, frames, masks)
            gen_loss = gen_loss + flow_loss + hole_w * hole + valid_w * valid
            aux.update(flow_loss=flow_loss, hole_loss=hole_w * hole,
                       valid_loss=valid_w * valid)
            return gen_loss, aux

        (g_loss, aux), (pred_ct, flows_ct) = (
            jax.value_and_grad(g_loss_fn, argnums=(0, 1), has_aux=True)(
                pred_imgs, pred_flows))
        (g_grads,) = g_vjp((pred_ct, flows_ct))

        if not no_dis:
            params_d = {"convs": params_d["convs"], "u": aux.pop("_u")}

        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, g_updates)

        logs.update(gen_loss=g_loss, **aux)
        new_state = TrainState(params_g, params_d, state.fixed_spynet,
                               opt_g, opt_d, state.step + 1)
        return new_state, logs

    return step_fn


def init_train_state(params_g, params_d, fixed_spynet, tx_g, tx_d):
    return TrainState(
        params_g=params_g,
        params_d=params_d,
        fixed_spynet=fixed_spynet,
        opt_g=tx_g.init(params_g),
        opt_d=tx_d.init(params_d),
        step=jnp.zeros((), jnp.int32),
    )
