"""Training losses: adversarial (nsgan/lsgan/hinge), L1 hole/valid, flow.

Functional equivalents of reference core/loss.py (AdversarialLoss) and the
loss assembly in core/trainer.py:293-360 / the flow-completion loss in
model/modules/flow_comp.py:11-46.
"""

import jax
import jax.numpy as jnp

from e2fgvi_tpu.models.e2fgvi import forward_bidirect_flow


def adversarial_loss(outputs, is_real: bool, is_disc: bool,
                     gan_type: str = "hinge"):
    """reference core/loss.py:29-41 semantics."""
    if gan_type == "hinge":
        if is_disc:
            o = -outputs if is_real else outputs
            return jax.nn.relu(1.0 + o).mean()
        return (-outputs).mean()
    target = jnp.full_like(outputs, 1.0 if is_real else 0.0)
    if gan_type == "nsgan":
        return -(target * jnp.log(outputs + 1e-8) +
                 (1 - target) * jnp.log(1 - outputs + 1e-8)).mean()
    if gan_type == "lsgan":
        return ((outputs - target) ** 2).mean()
    raise ValueError(gan_type)


def l1(a, b):
    return jnp.abs(a - b).mean()


def hole_valid_losses(pred_imgs, frames, masks):
    """Mask-normalized L1 losses (reference core/trainer.py:347-360).

    pred_imgs/frames: (B, T, H, W, 3); masks: (B, T, H, W, 1)."""
    hole = l1(pred_imgs * masks, frames * masks) / jnp.mean(masks)
    valid = (l1(pred_imgs * (1 - masks), frames * (1 - masks))
             / jnp.mean(1 - masks))
    return hole, valid


def flow_completion_loss(fixed_spynet_params, pred_flows, gt_local_frames):
    """L1 between predicted flows (trainable SPyNet, masked frames) and
    GT flows from a frozen SPyNet on unmasked frames
    (reference flow_comp.py:21-46). gt_local_frames in [0, 1]."""
    gt_flows = forward_bidirect_flow(
        jax.lax.stop_gradient(fixed_spynet_params), gt_local_frames)
    gt_flows = jax.lax.stop_gradient(gt_flows)
    return (l1(pred_flows[0], gt_flows[0]) +
            l1(pred_flows[1], gt_flows[1]))
