"""Pallas TPU kernels for the hot codec paths."""
