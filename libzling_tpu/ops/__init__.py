"""Device-side (JAX/XLA/Pallas) kernels for the zling codec stages."""
