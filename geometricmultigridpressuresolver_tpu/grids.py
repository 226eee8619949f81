"""Cell labels and grid conventions.

Replaces the reference's Houdini `UT_VoxelArray` substrate
(reference: Source/HDK_GeometricMultigridOperators.h:11 for the label enum,
Source/HDK_Utilities.h:17-23 for material labels) with dense arrays + masks.

Conventions used throughout the framework:

* Cell-centered scalar fields are arrays of shape ``(nx, ny, nz)``.
* Face-centered (MAC) fields are three arrays, one per axis, where the array
  for axis ``a`` has shape ``n[a] + 1`` along ``a`` and ``n`` elsewhere.
  Face ``i`` along axis ``a`` sits between cells ``i-1`` and ``i``.
* The Poisson operator is dimensionless exactly as in the reference: the
  interior stencil diagonal is 6, grid spacing ``dx`` is factored out and the
  caller scales the RHS by ``dx**2``
  (reference: Source/HDK_GeometricMultigridOperators.h:960-963).
"""

from __future__ import annotations

import enum

import numpy as np


class CellLabel(enum.IntEnum):
    """Multigrid cell labels.

    Mirrors the semantics of the reference enum ``CellLabels`` at
    Source/HDK_GeometricMultigridOperators.h:11 (INTERIOR_CELL,
    EXTERIOR_CELL, DIRICHLET_CELL, BOUNDARY_CELL).  Numeric values are chosen
    so that ``label >= INTERIOR`` means "solvable" (a DOF of the system).
    """

    EXTERIOR = 0
    DIRICHLET = 1
    INTERIOR = 2
    BOUNDARY = 3


class MaterialLabel(enum.IntEnum):
    """Fluid material labels for the free-surface pipeline.

    Mirrors reference Source/HDK_Utilities.h:17-23
    (SOLID_CELL/LIQUID_CELL/AIR_CELL).
    """

    SOLID = 0
    LIQUID = 1
    AIR = 2


LABEL_DTYPE = np.int8


def is_solvable(labels):
    """Mask of cells that carry a DOF (INTERIOR or BOUNDARY)."""
    return labels >= int(CellLabel.INTERIOR)


def is_dirichlet(labels):
    return labels == int(CellLabel.DIRICHLET)


def face_shape(cell_shape, axis):
    """Shape of the face array along `axis` for a given cell-grid shape."""
    shape = list(cell_shape)
    shape[axis] += 1
    return tuple(shape)


def cell_count(shape) -> int:
    return int(np.prod(np.asarray(shape)))
