"""Pallas TPU kernels.

Kernel strategy for this framework:

- The deformable-alignment sampler (the reference's mmcv CUDA kernel) is
  data-dependent gathering; current Mosaic exposes no dynamic vector gather
  (verified: `take_along_axis` / int indexing fail to lower; an in-kernel
  one-hot iota-compare matmul works but costs O(pixels x table) FLOPs).
  It therefore runs as an XLA 2x2-block gather (ops/dcn.py), which measures
  row-bound at the hardware gather issue rate.
- Attention can run on the stock Pallas flash-attention kernel
  (models/tfocal.py, E2FGVI_ATTENTION=flash) — the binary pooled-key bias
  maps onto segment masking.
- f3n.py fuses the F3N token-mixing chain (fold -> overlap-normalize ->
  unfold) into one VMEM-resident kernel per frame: purely static
  addressing, removes the HBM round-trip of the 60x108 canvas. It is
  exact in interpret mode (tests/test_kernels.py) but this box's Mosaic
  rejects the lowering ("Only 2D gather is supported" for the strided
  patch slices), so the model keeps the composed-XLA path; revisit when
  the toolchain gains >2D strided slicing.
"""
