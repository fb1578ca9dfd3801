"""Compute ops: batched solvers, update kernels, sampling, top-k."""
