"""Compute kernels: sampling, geometry, shading, ray-march (oracle + fused)."""
