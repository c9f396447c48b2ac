"""Pallas TPU kernels and functional ops."""
