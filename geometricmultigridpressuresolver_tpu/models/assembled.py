"""Assembled sparse-matrix Poisson system (host-side oracle + baseline).

Plays two roles, both present in the reference:

1. Cross-implementation oracle: the reference test node solves the same
   labels with an Eigen-assembled matrix and compares against the
   matrix-free grid solve (Source/HDK_TestGeometricMultigrid.cpp:675-1165).
   Here scipy.sparse replaces Eigen.

2. Baseline solver: HDK_FreeSurfacePressureSolver assembles triplets and
   runs Eigen's diagonal-preconditioned CG
   (Source/HDK_FreeSurfacePressureSolver.cpp:550-644, 366-381).  That
   classic path is `solve_assembled`.

The assembly is written directly from the label semantics of
computeLaplacian (Source/HDK_GeometricMultigridOperators.h:177-260),
independently of `ops.domain.build_level_coefficients`, so the two can
check each other.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from geometricmultigridpressuresolver_tpu.grids import CellLabel, is_solvable

EXT = int(CellLabel.EXTERIOR)
DIR = int(CellLabel.DIRICHLET)


def dof_indices(labels: np.ndarray) -> tuple[np.ndarray, int]:
    """Row index per solvable cell (-1 elsewhere), lexicographic scan order.

    Reference buildLiquidCellIndices (Source/HDK_Utilities.cpp:48-84).
    """
    solvable = is_solvable(labels)
    idx = np.full(labels.shape, -1, dtype=np.int64)
    idx[solvable] = np.arange(int(solvable.sum()))
    return idx, int(solvable.sum())


def assemble_poisson(
    labels: np.ndarray, face_weights: Sequence[np.ndarray] | None = None
) -> tuple[scipy.sparse.csr_matrix, np.ndarray]:
    """Assemble the dimensionless Poisson matrix over solvable DOFs.

    Semantics per face f (weight w_f, 1 on coarse levels) between cells a, b:
      * both solvable           -> A[a,b] -= w, A[b,a] -= w, diagonals += w
      * solvable vs DIRICHLET   -> diagonal of the solvable cell += w
      * solvable vs EXTERIOR    -> nothing
    """
    labels = np.asarray(labels)
    idx, ndof = dof_indices(labels)
    solvable = is_solvable(labels)

    rows, cols, vals = [], [], []
    diag = np.zeros(labels.shape, dtype=np.float64)

    for axis in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        lo, hi = tuple(lo), tuple(hi)

        if face_weights is not None:
            interior_faces = [slice(None)] * 3
            interior_faces[axis] = slice(1, -1)
            w = np.asarray(face_weights[axis], dtype=np.float64)[tuple(interior_faces)]
        else:
            w = np.ones(labels[lo].shape, dtype=np.float64)

        la, lb = labels[lo], labels[hi]
        sa, sb = solvable[lo], solvable[hi]
        ia, ib = idx[lo], idx[hi]

        both = sa & sb
        rows.append(ia[both])
        cols.append(ib[both])
        vals.append(-w[both])
        rows.append(ib[both])
        cols.append(ia[both])
        vals.append(-w[both])
        diag[lo] += np.where(sa & (lb != EXT), w, 0.0)
        diag[hi] += np.where(sb & (la != EXT), w, 0.0)

    rows.append(idx[solvable])
    cols.append(idx[solvable])
    vals.append(diag[solvable])

    a = scipy.sparse.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(ndof, ndof),
    ).tocsr()
    return a, idx


def grid_to_vec(x: np.ndarray, idx: np.ndarray) -> np.ndarray:
    return np.asarray(x)[idx >= 0]


def vec_to_grid(v: np.ndarray, idx: np.ndarray, shape) -> np.ndarray:
    out = np.zeros(shape, dtype=v.dtype)
    out[idx >= 0] = v
    return out


def solve_assembled(
    labels: np.ndarray,
    rhs_grid: np.ndarray,
    face_weights: Sequence[np.ndarray] | None = None,
    tol: float = 1e-10,
    x0_grid: np.ndarray | None = None,
    max_iterations: int = 10000,
) -> np.ndarray:
    """Diagonal-preconditioned CG on the assembled system (baseline path)."""
    a, idx = assemble_poisson(labels, face_weights)
    b = grid_to_vec(np.asarray(rhs_grid, dtype=np.float64), idx)
    x0 = None if x0_grid is None else grid_to_vec(np.asarray(x0_grid, np.float64), idx)
    d = a.diagonal()
    # Degenerate rows (a liquid cell whose every interior face is closed)
    # have a zero diagonal; guard the Jacobi preconditioner so they do not
    # poison the solve with infs.
    m = scipy.sparse.diags(np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 1.0))
    x, info = scipy.sparse.linalg.cg(a, b, x0=x0, rtol=tol, maxiter=max_iterations, M=m)
    if info != 0:
        raise RuntimeError(f"assembled CG did not converge: info={info}")
    return vec_to_grid(x, idx, labels.shape)


def project_assembled(
    liquid_phi,
    cut_cell_weights: Sequence,
    velocity: Sequence,
    solid_phi=None,
    solid_velocity: Sequence | None = None,
    old_pressure=None,
    tolerance: float = 1e-5,
    max_iterations: int = 2500,
    theta_clamp: float = 0.01,
):
    """Full baseline pressure projection: the classic assembled-matrix node.

    Mirrors HDK_FreeSurfacePressureSolver::solveGasSubclass
    (Source/HDK_FreeSurfacePressureSolver.cpp:107-481): the same material
    labels, ghost-fluid weights, RHS, writeback, gradient update, and
    divergence audit as the geometric node, but solved by
    diagonal-preconditioned CG on a host-assembled sparse matrix.  This is
    the reference's own performance baseline and this framework's
    cross-implementation oracle for the whole pipeline.

    Returns (pressure, projected_velocity, max_divergence).
    """
    import jax
    import jax.numpy as jnp

    from geometricmultigridpressuresolver_tpu.models import free_surface

    free_surface.validate_fields(
        liquid_phi, cut_cell_weights, velocity=velocity, solid_phi=solid_phi
    )
    # The setup math runs on-device in the widest available float: float64
    # needs jax_enable_x64 (tests enable it); without it the fields are
    # float32 while the assembled solve itself always runs in host float64.
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    liquid_phi = jnp.asarray(liquid_phi, dtype=dt)
    weights = tuple(jnp.asarray(w, dtype=dt) for w in cut_cell_weights)
    velocity = tuple(jnp.asarray(v, dtype=dt) for v in velocity)
    if solid_velocity is not None:
        solid_velocity = tuple(jnp.asarray(v, dtype=dt) for v in solid_velocity)

    (material, valid, grad_scale, mg_labels, _, mg_weights, _) = (
        free_surface._setup_base_fields(
            liquid_phi, weights,
            None if solid_phi is None else jnp.asarray(solid_phi, dt),
            theta_clamp, dt, dirichlet_band=0, want_compact=False,
        )
    )
    from geometricmultigridpressuresolver_tpu.grids import MaterialLabel

    liquid_mask = material == int(MaterialLabel.LIQUID)

    # The baseline node solves on the raw grid (no multigrid expansion);
    # relabel INTERIOR->BOUNDARY only matters for the MG path, so plain
    # labels + weights assemble directly.
    labels_np = np.asarray(mg_labels)
    weights_np = [np.asarray(w) for w in mg_weights]
    rhs = np.asarray(
        free_surface.negative_divergence(
            liquid_mask, velocity, weights, solid_velocity
        )
    )
    x0 = None
    if old_pressure is not None:
        x0 = np.where(np.asarray(liquid_mask), np.asarray(old_pressure), 0.0)

    pressure = solve_assembled(
        labels_np, rhs, weights_np, tol=tolerance, x0_grid=x0,
        max_iterations=max_iterations,
    )
    pressure = np.where(np.asarray(liquid_mask), pressure, 0.0)

    new_velocity = free_surface.apply_pressure_gradient(
        velocity, jnp.asarray(pressure), valid, grad_scale
    )
    max_div, _, _ = free_surface.divergence_stats(
        liquid_mask, new_velocity, weights, solid_velocity
    )
    return pressure, tuple(np.asarray(v) for v in new_velocity), float(max_div)
