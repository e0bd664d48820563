"""Fused Pallas (Mosaic) TPU kernels. See each module for the kernel design.

Each kernel has an XLA oracle in `seqrec_tpu.ops.xla`; parity is enforced by
tests/kernels (interpret mode on CPU, compiled on TPU).
"""
