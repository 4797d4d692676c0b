"""Evaluate-CLI smoke test on a synthetic davis-layout mini dataset."""

import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def mini_davis(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    dav = root / "davis"
    (dav / "JPEGImages").mkdir(parents=True)
    mask_dir = dav / "test_masks" / "vid0"
    mask_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t, h, w = 8, 120, 216
    with zipfile.ZipFile(dav / "JPEGImages" / "vid0.zip", "w") as zf:
        for i in range(t):
            img = Image.fromarray(
                rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
            p = root / f"f{i}.jpg"
            img.save(p, quality=90)
            zf.write(p, arcname=f"{i:05d}.jpg")
        mask = np.zeros((h, w), np.uint8)
        mask[30:60, 50:120] = 255
    for i in range(t):
        Image.fromarray(mask).save(mask_dir / f"{i:05d}.png")
    with open(dav / "test.json", "w") as f:
        json.dump({"vid0": t}, f)
    return str(root)


@pytest.mark.slow
def test_evaluate_cli_smoke(mini_davis, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from e2fgvi_tpu.cli import evaluate
    psnr, ssim, fid = evaluate.main([
        "--dataset", "davis", "--data_root", mini_davis,
        "--ckpt", "dummy", "--random_weights", "--model", "e2fgvi_hq",
        "--width", "216", "--height", "120", "--max_batch", "2",
        "--save_results",
    ])
    # random weights: metrics exist and are sane, VFID skipped (no I3D ckpt)
    assert 5.0 < psnr < 60.0
    assert 0.0 < ssim <= 1.0
    assert np.isnan(fid)
    out = tmp_path / "results" / "e2fgvi_hq_davis"
    assert (out / "e2fgvi_hq_davis_metrics.txt").exists()
    assert len(list((out / "vid0").glob("*.png"))) == 8
