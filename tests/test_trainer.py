"""Trainer runtime end-to-end smoke: real data pipeline, 2 steps, resume."""

import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

import jax

from e2fgvi_tpu.parallel import mesh as meshlib
from e2fgvi_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def mini_train_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    name = "mini-vos"
    img_dir = root / name / "JPEGImages"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    manifest = {}
    for v in range(2):
        frames = 10
        with zipfile.ZipFile(img_dir / f"video{v}.zip", "w") as zf:
            for i in range(frames):
                img = Image.fromarray(
                    rng.integers(0, 255, (120, 216, 3), dtype=np.uint8))
                p = root / "tmp.jpg"
                img.save(p, quality=85)
                zf.write(p, arcname=f"{i:05d}.jpg")
        manifest[f"video{v}"] = frames
    with open(root / name / "train.json", "w") as f:
        json.dump(manifest, f)
    return str(root), name


@pytest.mark.slow
def test_trainer_two_steps_and_resume(mini_train_root, tmp_path):
    root, name = mini_train_root
    config = {
        "seed": 7,
        "save_dir": str(tmp_path / "ckpts"),
        "train_data_loader": {
            "name": name, "data_root": root, "w": 216, "h": 120,
            "num_local_frames": 3, "num_ref_frames": 1,
        },
        "losses": {"hole_weight": 1, "valid_weight": 1, "flow_weight": 1,
                   "adversarial_weight": 0.01, "GAN_LOSS": "hinge"},
        "model": {"net": "e2fgvi_hq", "no_dis": 0},
        "trainer": {
            "beta1": 0, "beta2": 0.99, "lr": 1e-4, "batch_size": 1,
            "num_workers": 1, "log_freq": 1, "save_freq": 1,
            "iterations": 1000,
            "scheduler": {"type": "MultiStepLR", "milestones": [400],
                          "gamma": 0.1},
        },
    }
    mesh = meshlib.make_mesh(data=1, model=1, devices=jax.devices()[:1])
    tr = Trainer(config, mesh=mesh)
    tr.train(max_steps=2)
    assert tr.iteration == 2
    assert tr.ckpt.latest_iteration() == 2
    # TB event file written
    tb = [f for f in os.listdir(os.path.join(config["save_dir"], "tb"))]
    assert any(f.startswith("events.out.tfevents") for f in tb)

    # resume in a fresh Trainer
    tr2 = Trainer(config, mesh=mesh)
    assert tr2.iteration == 2
    tr2.train(max_steps=1)
    assert tr2.iteration == 3
