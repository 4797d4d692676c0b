"""Does the axon tunnel compress host->device transfers?

If device_put of compressible bytes (zeros / temporal deltas of real
video) is faster than incompressible random bytes at the same size, the
tunnel compresses — then a lossless mod-256 temporal delta of the input
frames (video is highly correlated) shrinks the dominant upload leg of
the serving pipeline at the cost of a trivial on-device cumsum.

Run (TPU): python scripts/exp_link_r04.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

T, H, W = 72, 240, 432
SHAPE = (T, H, W, 3)
NBYTES = int(np.prod(SHAPE))


@jax.jit
def _sum1(x):
    return jnp.sum(x.astype(jnp.float32).ravel()[::65537])


def timed_put(name, arr, reps=4):
    # block_until_ready is a no-op under the axon backend: force real
    # completion with a scalar readback that DEPENDS on the whole array
    # (strided sum touches every page); its own round trip (~rtt) is
    # measured by the 'fence only' row below and is shared by all rows
    np.asarray(_sum1(jax.device_put(arr)))  # warmup
    t0 = time.time()
    for _ in range(reps):
        np.asarray(_sum1(jax.device_put(arr)))
    dt = (time.time() - t0) / reps
    print(f"{name:28s} {dt * 1e3:8.1f} ms   "
          f"{arr.nbytes / dt / 1e6:7.1f} MB/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    rand = rng.integers(0, 256, SHAPE, dtype=np.uint8)
    zeros = np.zeros(SHAPE, np.uint8)

    # real video if present
    frames = None
    ex = "/root/reference/examples/tennis"
    if os.path.isdir(ex):
        from e2fgvi_tpu.data import readers
        pil = readers.read_frames_from_dir(ex, (W, H))
        frames = np.stack([np.asarray(f, np.uint8) for f in pil])
        frames = np.concatenate(
            [frames, frames[-1:].repeat(T - len(frames) % T if len(frames)
                                        % T else 0, 0)])[:T]

    print(f"payload {NBYTES / 1e6:.1f} MB ({SHAPE})", flush=True)
    timed_put("fence only (16B)", np.zeros((2, 2), np.uint8))
    timed_put("random uint8", rand)
    timed_put("zeros uint8", zeros)
    if frames is not None:
        timed_put("tennis frames", frames)
        delta = np.concatenate(
            [frames[:1],
             (frames[1:].astype(np.int16)
              - frames[:-1].astype(np.int16)).astype(np.uint8)])
        timed_put("tennis temporal delta", delta)
        # reconstruction cost on device: cumsum mod 256 over T
        dd = jax.device_put(delta)

        @jax.jit
        def recon(d):
            return jax.lax.associative_scan(
                lambda a, b: (a + b).astype(jnp.uint8),
                d.astype(jnp.uint8), axis=0)

        np.asarray(_sum1(recon(dd)))
        t0 = time.time()
        for _ in range(8):
            np.asarray(_sum1(recon(dd)))
        print(f"{'device recon (cumsum mod256)':28s} "
              f"{(time.time() - t0) / 8 * 1e3:8.1f} ms  (incl fence rtt)",
              flush=True)
        ok = bool((np.asarray(recon(dd)) == frames).all())
        print(f"recon exact: {ok}", flush=True)


if __name__ == "__main__":
    main()
