"""Pallas TPU kernels — only code the model actually runs.

Kernel strategy for this framework:

- dcn_band.py: the deformable-alignment sampler (the reference's mmcv
  CUDA kernel, feat_prop.py:55-58). Mosaic exposes no 2D dynamic vector
  gather, so the kernel gathers dynamically along lanes (x) and sweeps an
  8-row-blocked vertical band (y) whose per-(group, tap) row range is
  delivered by scalar prefetch — only the blocks a tile's measured
  offsets can touch are swept. Exact under a per-video band contract
  checked against the in-forward offset bound (data/pipeline.py
  re-dispatches at the exact band on violation; the XLA block-gather in
  ops/dcn.py remains the fallback and the differentiable training path).
- Attention runs on the stock Pallas flash-attention kernel by default on
  the 16-bit path (models/tfocal.py) with whole-key-axis block tuning;
  the binary pooled-key bias maps onto segment masking. f32 parity runs
  keep the XLA softmax (E2FGVI_ATTENTION=xla opts out everywhere).
- The F3N token-mixing chain needs no kernel: fc1+fold and unfold+fc2
  each collapse into one convolution with gelu moved to pixel space
  (models/tfocal.py _fusion_feed_forward_conv) — the fused-Pallas variant
  this package once carried was superseded by that exact reformulation.
"""
