"""Compute ops: pure-jnp oracles and Pallas TPU kernels."""
