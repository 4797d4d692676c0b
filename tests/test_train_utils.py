"""Tests for schedules (vs torch oracle), TB event writer, adversarial loss."""

import struct

import numpy as np
import torch
import jax.numpy as jnp

from e2fgvi_tpu.train import losses, schedules
from e2fgvi_tpu.utils.tb import SummaryWriter, _masked_crc


def test_multistep_matches_torch():
    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=1e-4)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[400, 700],
                                                 gamma=0.1)
    mine = schedules.multistep_restart_lr(1e-4, [400, 700], 0.1)
    for it in range(1000):
        np.testing.assert_allclose(mine(it), opt.param_groups[0]["lr"],
                                   rtol=1e-6)
        opt.step()
        sched.step()


def test_cosine_restart_shape():
    fn = schedules.cosine_annealing_restart_lr(1e-4, [100, 100],
                                               (1.0, 0.5), eta_min=1e-7)
    assert abs(fn(0) - 1e-4) < 1e-9
    assert fn(100) < 1e-6          # end of first period
    assert abs(fn(101) - fn(101)) == 0
    assert fn(150) < 0.5 * 1e-4 + 1e-6


def test_make_schedule_from_reference_config():
    cfg = {"type": "MultiStepLR", "milestones": [400000], "gamma": 0.1}
    fn = schedules.make_schedule(cfg, 1e-4)
    assert abs(fn(0) - 1e-4) < 1e-12
    assert abs(fn(400001) - 1e-5) < 1e-12


def test_adversarial_loss_hinge_matches_reference_formula():
    x = jnp.asarray(np.linspace(-2, 2, 7, dtype=np.float32))
    # discriminator real: mean(relu(1 - x)); fake: mean(relu(1 + x))
    np.testing.assert_allclose(
        losses.adversarial_loss(x, True, True, "hinge"),
        np.maximum(1 - np.asarray(x), 0).mean(), rtol=1e-6)
    np.testing.assert_allclose(
        losses.adversarial_loss(x, False, True, "hinge"),
        np.maximum(1 + np.asarray(x), 0).mean(), rtol=1e-6)
    # generator: -mean(x)
    np.testing.assert_allclose(
        losses.adversarial_loss(x, True, False, "hinge"),
        -np.asarray(x).mean(), rtol=1e-6)


def test_tb_writer_record_framing(tmp_path):
    w = SummaryWriter(str(tmp_path))
    for i in range(5):
        w.add_scalar("loss/gen", 1.0 / (i + 1), i)
    w.close()
    files = list(tmp_path.iterdir())
    assert len(files) == 1
    data = files[0].read_bytes()
    # walk the TFRecord framing, verifying CRCs
    off, records = 0, 0
    while off < len(data):
        (length,) = struct.unpack("<Q", data[off: off + 8])
        (len_crc,) = struct.unpack("<I", data[off + 8: off + 12])
        assert len_crc == _masked_crc(data[off: off + 8])
        payload = data[off + 12: off + 12 + length]
        (pay_crc,) = struct.unpack(
            "<I", data[off + 12 + length: off + 16 + length])
        assert pay_crc == _masked_crc(payload)
        off += 16 + length
        records += 1
    assert records == 6  # file header event + 5 scalars
    assert b"loss/gen" in data
