"""Hand-written TPU kernels (Pallas) for the hot synthesis paths."""
