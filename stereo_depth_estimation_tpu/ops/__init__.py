"""Pure functional compute ops (JAX + NumPy twins where the host needs them)."""
