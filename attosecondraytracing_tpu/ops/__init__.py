"""Device-side compute kernels (geometry, surfaces, trace, defects)."""
