"""Device ops: batched prefilter + Smith-Waterman scoring kernels."""
