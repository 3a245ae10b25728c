"""Pure NumPy/Python kernels — no Spark imports; unit-testable standalone."""
