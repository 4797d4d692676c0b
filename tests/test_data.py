"""Data-layer tests: window planning, mirror padding, masks, video writer."""

import os

import numpy as np
import pytest
import torch

from e2fgvi_tpu.data import masks as masklib
from e2fgvi_tpu.data import pipeline, video


def test_window_plan_matches_reference_formulas():
    """neighbor/ref selection must equal the reference loops
    (test.py:39-53, 146-151) for representative lengths."""
    for length in (1, 6, 11, 50, 70, 104):
        for f in range(0, length, 5):
            nb = pipeline.neighbor_ids(f, length, 5)
            assert nb == [i for i in range(max(0, f - 5),
                                           min(length, f + 6))]
            refs = pipeline.ref_ids(f, nb, length, 10, -1)
            want = [i for i in range(0, length, 10) if i not in nb]
            assert refs == want
    # num_ref-limited variant incl. its >num_ref off-by-one behavior
    length, f = 104, 50
    nb = pipeline.neighbor_ids(f, length, 5)
    refs = pipeline.ref_ids(f, nb, length, 10, num_ref=3)
    want = []
    for i in range(max(0, f - 10 * 1), min(length, f + 10 * 1) + 1, 10):
        if i not in nb:
            if len(want) > 3:
                break
            want.append(i)
    assert refs == want


def test_mirror_pad_matches_torch_flip_concat(rng):
    """mirror_pad_hw must equal the reference flip-and-concat trick
    (test.py:156-165)."""
    x = rng.standard_normal((2, 3, 100, 200, 3), dtype=np.float32)
    got, (h, w) = pipeline.mirror_pad_hw(x, 60, 108)
    assert (h, w) == (100, 200)
    t = torch.from_numpy(np.moveaxis(x, -1, 2))  # (B,T,C,H,W)
    h_pad = (60 - 100 % 60) % 60
    w_pad = (108 - 200 % 108) % 108
    t = torch.cat([t, torch.flip(t, [3])], 3)[:, :, :, :100 + h_pad]
    t = torch.cat([t, torch.flip(t, [4])], 4)[:, :, :, :, :200 + w_pad]
    want = np.moveaxis(t.numpy(), 2, -1)
    np.testing.assert_array_equal(got, want)
    assert got.shape[-3] % 60 == 0 and got.shape[-2] % 108 == 0


def test_random_masks_properties():
    ms = masklib.create_random_shape_with_random_motion(12, 240, 432,
                                                        seed=7)
    assert len(ms) == 12
    for m in ms:
        arr = np.asarray(m)
        assert arr.shape == (240, 432)
        assert set(np.unique(arr)).issubset({0, 255})
        assert arr.any()
    # static vs moving are both reachable
    kinds = set()
    for seed in range(12):
        ms = masklib.create_random_shape_with_random_motion(4, 64, 64,
                                                            seed=seed)
        static = all(np.array_equal(np.asarray(ms[0]), np.asarray(m))
                     for m in ms)
        kinds.add(static)
    assert kinds == {True, False}


def test_dilate_cross_matches_bruteforce(rng):
    m = (rng.uniform(0, 1, (40, 50)) > 0.97).astype(np.uint8)
    got = masklib.dilate_cross(m, 4)
    # brute force: 1 iff any seed within L1 distance <= 4
    ys, xs = np.nonzero(m)
    want = np.zeros_like(m)
    for y in range(40):
        for x in range(50):
            if len(ys) and np.min(np.abs(ys - y) + np.abs(xs - x)) <= 4:
                want[y, x] = 1
    np.testing.assert_array_equal(got, want)


def test_mjpeg_avi_writer_roundtrip(tmp_path, rng):
    frames = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
              for _ in range(5)]
    path = str(tmp_path / "out.avi")
    written = video.write_video(path, frames, fps=10)
    assert os.path.getsize(written) > 1000
    with open(written, "rb") as f:
        head = f.read(12)
    assert head[:4] == b"RIFF" and head[8:12] == b"AVI "


def _mp4_boxes(buf, start, end):
    """Top-level {tag: (payload_start, payload_end)} of an ISO BMFF span."""
    import struct as _s
    out = {}
    o = start
    while o < end:
        size = _s.unpack(">I", buf[o:o + 4])[0]
        tag = buf[o + 4:o + 8].decode("ascii")
        out[tag] = (o + 8, o + size)
        o += size
    return out


def test_write_video_mp4_decodes_back(tmp_path, rng):
    """write_video('.mp4') must produce an mp4 a video reader can decode
    back to the input frames, whatever backend wrote it (cv2 mp4v — the
    reference's writer, test.py:191-196 — or the pure-Python muxer)."""
    from e2fgvi_tpu.data import readers
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    frames = [np.stack([yy * 5 + i * 10, xx * 3, yy + xx], -1
                       ).clip(0, 255).astype(np.uint8) for i in range(5)]
    path = str(tmp_path / "out.mp4")
    written = video.write_video(path, frames, fps=10)
    assert written.endswith(".mp4")
    back = readers.read_frames_from_video(written)
    assert len(back) == 5
    for i, img in enumerate(back):
        arr = np.asarray(img)
        assert arr.shape == (48, 64, 3)
        assert np.abs(arr.astype(np.int32)
                      - frames[i].astype(np.int32)).mean() < 30


def test_mjpeg_mp4_writer_roundtrip(tmp_path, rng):
    """The self-contained muxer must produce a real ISO BMFF mp4 whose
    samples decode back to the input frames (the no-cv2/no-ffmpeg
    fallback for the reference test.py:191-196 contract)."""
    import io
    import struct as _s
    from PIL import Image
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    frames = [np.stack([yy * 5 + i * 10, xx * 3, yy + xx], -1
                       ).clip(0, 255).astype(np.uint8) for i in range(5)]
    written = str(tmp_path / "out.mp4")
    video.write_mjpeg_mp4(written, frames, fps=10)
    buf = open(written, "rb").read()
    top = _mp4_boxes(buf, 0, len(buf))
    assert set(top) == {"ftyp", "mdat", "moov"}
    # walk moov -> trak -> mdia -> minf -> stbl
    boxes = _mp4_boxes(buf, *top["moov"])
    for tag in ("trak", "mdia", "minf", "stbl"):
        boxes = _mp4_boxes(buf, *boxes[tag])
    stbl = boxes
    # sample sizes and the single chunk offset
    s, _ = stbl["stsz"]
    cnt = _s.unpack(">I", buf[s + 8:s + 12])[0]
    sizes = _s.unpack(f">{cnt}I", buf[s + 12:s + 12 + 4 * cnt])
    assert cnt == 5
    s, _ = stbl["stco"]
    off = _s.unpack(">I", buf[s + 8:s + 12])[0]
    # every sample is a complete JPEG that decodes to the original frame
    for i, sz in enumerate(sizes):
        data = buf[off:off + sz]
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        img = np.asarray(Image.open(io.BytesIO(data)))
        assert img.shape == (48, 64, 3)
        # JPEG is lossy; mean error should still be small
        assert np.abs(img.astype(np.int32)
                      - frames[i].astype(np.int32)).mean() < 30
        off += sz


def test_native_matches_numpy(rng):
    from e2fgvi_tpu.data import native
    if not native.available():
        native.build()
    m = (rng.uniform(0, 1, (100, 120)) > 0.99).astype(np.uint8)
    np.testing.assert_array_equal(native.dilate_cross(m, 4),
                                  masklib.dilate_cross(m, 4))
    pred = rng.uniform(0, 255, (50, 60, 3)).astype(np.float32)
    orig = rng.integers(0, 255, (50, 60, 3), dtype=np.uint8)
    mk = (rng.uniform(0, 1, (50, 60)) > 0.5).astype(np.uint8)
    ref = (pred.astype(np.uint8) * mk[..., None] +
           orig * (1 - mk[..., None])).astype(np.float32)
    np.testing.assert_allclose(
        native.composite_blend(pred, orig, mk, None), ref)


def test_vendored_mp4_example_reads():
    """The vendored mp4 example (reference ships examples/schoolgirls.mp4,
    test.py:74-94; we vendor the tennis clip re-muxed as mp4) must decode
    through the CLI's mp4 input path to the same clip as the frame dir."""
    import os

    from e2fgvi_tpu.data import readers
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "examples", "tennis.mp4")
    frames = readers.read_frames(path, size=(432, 240))
    assert len(frames) == 70
    a = np.asarray(frames[0], np.float32)
    assert a.shape == (240, 432, 3)
    ref = np.asarray(readers.read_frames(
        os.path.join(root, "examples", "tennis"), size=(432, 240))[0],
        np.float32)
    # mp4v is lossy; same content within codec noise
    assert np.abs(a - ref).mean() < 8.0
