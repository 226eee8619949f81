"""Solver drivers (layer L3): V-cycle engine and matrix-free PCG."""

from geometricmultigridpressuresolver_tpu.solver.mg import (
    MGHierarchy,
    build_hierarchy,
    v_cycle,
)
from geometricmultigridpressuresolver_tpu.solver.cg import solve_pcg, CGResult

__all__ = ["MGHierarchy", "build_hierarchy", "v_cycle", "solve_pcg", "CGResult"]
