"""Compute kernels: modular arithmetic, NTT, and their Pallas TPU variants."""
