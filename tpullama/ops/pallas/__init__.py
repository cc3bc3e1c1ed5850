"""Pallas TPU kernels: fused dequant-matmul, flash attention."""
