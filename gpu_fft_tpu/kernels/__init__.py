"""TPU compute kernels: DFT/twiddle table generation, fused Pallas transforms,
and the large-N JAX-level factorization."""
