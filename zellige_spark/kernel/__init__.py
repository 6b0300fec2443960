"""Pure numpy geometry/MVT kernels (no Spark imports here)."""
