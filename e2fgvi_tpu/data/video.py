"""Video writing without external codec dependencies.

Preferred: imageio-ffmpeg mp4 when available (matches the reference's
cv2.VideoWriter mp4 output, test.py:191-196). Fallback: a self-contained
MJPEG-AVI writer (RIFF container + JPEG frames via PIL) — playable
everywhere, zero native deps. A PNG frame-directory dump is also provided
(used by evaluate --save_results for E_warp tooling, evaluate.py:143-151).
"""

import io
import os
import struct

import numpy as np
from PIL import Image


def _fourcc(s):
    return s.encode("ascii")


def write_mjpeg_avi(path, frames, fps=24, quality=95):
    """frames: iterable of uint8 (H, W, 3) RGB arrays -> .avi file."""
    frames = list(frames)
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\x00"
        jpegs.append(data)

    n = len(jpegs)
    usec_per_frame = int(1_000_000 / fps)
    max_bytes = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I", usec_per_frame, max_bytes * fps, 0, 0x10, n, 0, 1,
        max_bytes, w, h, 0, 0, 0, 0)
    strh = _fourcc("vids") + _fourcc("MJPG") + struct.pack(
        "<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0xFFFFFFFF,
        0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, _fourcc("MJPG"),
                       w * h * 3, 0, 0, 0, 0)

    def chunk(tag, data):
        pad = b"\x00" if len(data) % 2 else b""
        return _fourcc(tag) + struct.pack("<I", len(data)) + data + pad

    def lst(tag, data):
        return chunk("LIST", _fourcc(tag) + data)

    hdrl = lst("hdrl", chunk("avih", avih) +
               lst("strl", chunk("strh", strh) + chunk("strf", strf)))

    movi_items = b""
    offsets = []
    off = 4  # after 'movi'
    for j in jpegs:
        offsets.append((off, len(j)))
        movi_items += chunk("00dc", j)
        off += 8 + len(j) + (len(j) % 2)
    movi = lst("movi", movi_items)

    idx = b""
    for o, ln in offsets:
        idx += _fourcc("00dc") + struct.pack("<III", 0x10, o, ln)
    idx1 = chunk("idx1", idx)

    riff_body = _fourcc("AVI ") + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(_fourcc("RIFF") + struct.pack("<I", len(riff_body)) +
                riff_body)


def write_video(path, frames, fps=24):
    """Write RGB uint8 frames; chooses the best available backend.

    Returns the actual path written (extension may change to .avi when no
    mp4 encoder exists)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    if path.endswith(".mp4"):
        try:
            import imageio
            with imageio.get_writer(path, fps=fps) as wr:
                for f in frames:
                    wr.append_data(f)
            return path
        except Exception:
            path = path[:-4] + ".avi"
    if not path.endswith(".avi"):
        path = path + ".avi"
    write_mjpeg_avi(path, frames, fps=fps)
    return path


def write_frames(dirpath, frames):
    """Dump frames as zero-padded PNGs (for external E_warp evaluation)."""
    os.makedirs(dirpath, exist_ok=True)
    for i, f in enumerate(frames):
        Image.fromarray(np.asarray(f, np.uint8)).save(
            os.path.join(dirpath, f"{i:05d}.png"))
