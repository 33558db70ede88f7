"""Pallas TPU kernels — the hand-tuned tier under the XLA-compiled ops."""
