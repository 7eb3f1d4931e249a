"""Batch optimizers over factor-graph arrays."""

from toyslam_tpu.optimizer.gauss_newton import (
    GaussNewton,
    OptimizeResult,
    dense_linearize_solve,
)
