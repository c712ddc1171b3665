"""Compute kernels: pattern/coverage/blend math (single-source, numpy and
jax.numpy backends) + the jitted tile raster engine."""
