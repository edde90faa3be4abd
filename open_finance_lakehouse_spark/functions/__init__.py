"""Vectorized kernels: audio codecs/SNR and space-filling-curve keys."""
