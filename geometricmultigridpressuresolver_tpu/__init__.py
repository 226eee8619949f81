"""TPU-native geometric multigrid pressure-Poisson framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
rgoldade/GeometricMultigridPressureSolver (McAdams et al. 2010 multigrid
preconditioned conjugate gradient for free-surface liquid pressure
projection).  The reference is a Houdini HDK C++ plug-in over tiled sparse
voxel grids with TBB threading; this framework instead uses dense
HBM-resident voxel grids masked by cell labels, XLA/Pallas stencil kernels,
and `jax.sharding` SPMD for multi-chip scaling.

Layer map (mirrors reference SURVEY.md section 1):
  L1  utils/, grids.py      -- labels, masks, ghost-fluid weights
  L2  ops/                  -- multigrid operator library (stencils, transfer,
                               grid BLAS), the numerical core
  L3  solver/               -- V-cycle engine + matrix-free PCG driver
  L4  models/               -- free-surface pressure projection pipelines
      parallel/             -- device-mesh sharding (new vs reference)
"""

from geometricmultigridpressuresolver_tpu.grids import CellLabel
from geometricmultigridpressuresolver_tpu.config import SolverConfig

__version__ = "0.1.0"

__all__ = ["CellLabel", "SolverConfig", "__version__"]
