"""Pallas TPU kernels for the hot ops (fused gather-TP-scatter)."""
