"""e2fgvi_tpu — a TPU-native (JAX/XLA/Pallas) video-inpainting framework.

A from-scratch rebuild of the capabilities of MCG-NKU/E2FGVI (CVPR 2022,
"Towards An End-to-End Framework for Flow-Guided Video Inpainting"), designed
TPU-first:

- NHWC layouts throughout; every hot op maps onto the MXU (matmul-form resize,
  patch embedding as a single GEMM, focal attention as batched GEMMs).
- Pure-functional models (parameter pytrees + jit-compiled apply functions);
  static shapes per (T, H, W) bucket so XLA compiles each window shape once.
- The reference's CUDA dependencies (mmcv modulated_deform_conv2d,
  torch grid_sample / fold / unfold, NCCL) are replaced by native XLA/Pallas
  formulations, not wrappers (see `e2fgvi_tpu.ops`).
- Data parallel scaling via `jax.sharding.Mesh` + NamedSharding; XLA emits the
  collectives over ICI (no hand-written NCCL analog).

Reference parity targets: DAVIS PSNR 33.01 / SSIM 0.9721 / VFID 0.116 with the
released E2FGVI-CVPR22 checkpoint (converted via `e2fgvi_tpu.convert`).
"""

__version__ = "0.1.0"
