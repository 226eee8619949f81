"""Sharding placement for solver data structures.

Places every static grid of a `PoissonProblem` / `ProjectionSetup` on the
mesh: fine levels block-partitioned, coarse levels replicated once any axis
would fall below a per-device threshold, and the tiny coarsest direct-solve
operator always replicated.  With inputs placed this way, `jax.jit`'s SPMD
partitioner propagates shardings through the whole V-cycle/PCG computation
and inserts halo exchanges (collective-permute) for the stencil pads and
psums for the reductions -- the scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from geometricmultigridpressuresolver_tpu.models import free_surface
from geometricmultigridpressuresolver_tpu.ops import stencil
from geometricmultigridpressuresolver_tpu.parallel.mesh import grid_pspec
from geometricmultigridpressuresolver_tpu.solver import mg as mg_mod
from geometricmultigridpressuresolver_tpu.solver import mgpcg


def _put(arr: jax.Array, mesh: Mesh, spec: PartitionSpec) -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_grid(arr: jax.Array, mesh: Mesh, min_per_device: int = 8) -> jax.Array:
    """Place one cell-shaped (or face-shaped) grid on the mesh."""
    spec = grid_pspec(mesh, arr.shape, min_per_device)
    return _put(arr, mesh, spec)


def shard_velocity(velocity, mesh: Mesh, min_per_device: int = 8):
    return tuple(shard_grid(jnp.asarray(v), mesh, min_per_device) for v in velocity)


def _shard_level(
    c: stencil.LevelCoeffs, mesh: Mesh, min_per_device: int
) -> stencil.LevelCoeffs:
    cell_spec = grid_pspec(mesh, c.shape, min_per_device)
    # Every LevelCoeffs array (including edge weights) is cell-shaped, so a
    # single partitioning covers the whole level.
    return stencil.LevelCoeffs(*(_put(a, mesh, cell_spec) for a in c))


def shard_problem(
    problem: mgpcg.PoissonProblem, mesh: Mesh, min_per_device: int = 8
) -> mgpcg.PoissonProblem:
    levels = tuple(
        _shard_level(c, mesh, min_per_device) for c in problem.hier.levels
    )
    replicated = PartitionSpec()
    hier = mg_mod.MGHierarchy(
        levels=levels,
        coarse_dofs=_put(problem.hier.coarse_dofs, mesh, replicated),
        coarse_minv=_put(problem.hier.coarse_minv, mesh, replicated),
        coarse_chol=_put(problem.hier.coarse_chol, mesh, replicated),
    )
    fine = _shard_level(problem.fine, mesh, min_per_device)
    return mgpcg.PoissonProblem(fine=fine, hier=hier)


def shard_setup(
    setup: free_surface.ProjectionSetup, mesh: Mesh, min_per_device: int = 8
) -> free_surface.ProjectionSetup:
    return free_surface.ProjectionSetup(
        problem=shard_problem(setup.problem, mesh, min_per_device),
        material=shard_grid(setup.material, mesh, min_per_device),
        # MAC face arrays replicate their own +1 axis (indivisible) and
        # shard the other two via the per-shape pspec rule.  Derived fields
        # (liquid mask, valid faces, gradient scales) are recomputed inside
        # the projection program and inherit shardings from these.
        weights=tuple(shard_grid(w, mesh, min_per_device) for w in setup.weights),
        liquid_phi=shard_grid(setup.liquid_phi, mesh, min_per_device),
        window_start=_put(setup.window_start, mesh, PartitionSpec()),
        expanded_shape=setup.expanded_shape,
        base_pads=setup.base_pads,
        padding=setup.padding,
        mg_levels=setup.mg_levels,
        window_start_static=setup.window_start_static,
    )
