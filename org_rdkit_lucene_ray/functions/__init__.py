"""Vectorized scalar/batch functions (pyarrow.compute first, numpy second)."""
