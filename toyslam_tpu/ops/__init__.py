"""Numerical kernels: Lie-group ops, residuals/Jacobians, assembly, solvers."""
