"""Host-side multigrid domain construction (numpy).

This is the setup phase that runs once per label set: domain expansion,
level coarsening, boundary relabeling, boundary-band construction, and
per-level stencil-coefficient precomputation.  The reference does all of
this with tile-parallel C++ loops over Houdini voxel arrays; here the same
label semantics are expressed as vectorized numpy array ops, and the results
are shipped to the device once as static per-level coefficient grids.

Reference equivalents:
  * expand_domain        -> buildExpandedCellLabels
                            (Source/HDK_GeometricMultigridOperators.h:1328-1456)
  * expand_face_weights  -> buildExpandedBoundaryWeights
                            (Source/HDK_GeometricMultigridOperators.h:1458-1572)
  * set_boundary_labels  -> setBoundaryCellLabels
                            (Source/HDK_GeometricMultigridOperators.h:1574-1644)
  * coarsen_labels       -> buildCoarseCellLabels
                            (Source/HDK_GeometricMultigridOperators.cpp:23-163)
  * boundary_band        -> buildBoundaryCells
                            (Source/HDK_GeometricMultigridOperators.cpp:165-469),
                            but as a dense mask instead of a sorted cell list
  * check_* invariants   -> unitTestCoarsening / unitTestBoundaryCells /
                            unitTestExteriorCells
                            (Source/HDK_GeometricMultigridOperators.cpp:471-632,
                             Source/HDK_GeometricMultigridOperators.h:1771-1870)
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from geometricmultigridpressuresolver_tpu.grids import (
    LABEL_DTYPE,
    CellLabel,
    face_shape,
    is_solvable,
)

EXT = int(CellLabel.EXTERIOR)
DIR = int(CellLabel.DIRICHLET)
INT = int(CellLabel.INTERIOR)
BND = int(CellLabel.BOUNDARY)


def next_pow2(n: int) -> int:
    return 1 << max(0, math.ceil(math.log2(n))) if n > 1 else 1


def expansion_params(base_shape: Sequence[int]) -> tuple[int, int, tuple[int, int, int]]:
    """Multigrid level count, exterior padding, and expanded grid shape.

    mg_levels = ceil(log2(min dim)) - 1 (caps the hierarchy at 4 voxels in
    the smallest dimension); padding = 2**(mg_levels-1) exterior cells per
    side so every coarse level keeps >= 1 exterior ring; each axis is then
    rounded up to a power of two.
    Reference: Source/HDK_GeometricMultigridOperators.h:1341-1360.
    """
    min_dim = min(base_shape)
    if min_dim < 4:
        raise ValueError(f"grid too small for multigrid: {base_shape}")
    mg_levels = math.ceil(math.log2(min_dim)) - 1
    padding = 2 ** (mg_levels - 1)
    expanded = tuple(next_pow2(s + 2 * padding) for s in base_shape)
    return mg_levels, padding, expanded


def expand_domain(base_labels: np.ndarray) -> tuple[np.ndarray, tuple[int, int, int], int]:
    """Embed base labels into the padded power-of-two multigrid domain.

    Non-exterior base cells are copied at offset `padding`; everything else
    is EXTERIOR.  Returns (expanded_labels, offset, mg_levels).
    """
    base_labels = np.asarray(base_labels)
    mg_levels, padding, expanded_shape = expansion_params(base_labels.shape)
    expanded = np.full(expanded_shape, EXT, dtype=LABEL_DTYPE)
    sl = tuple(slice(padding, padding + s) for s in base_labels.shape)
    region = expanded[sl]
    region[base_labels == INT] = INT
    region[base_labels == BND] = INT  # boundary tagging happens later
    region[base_labels == DIR] = DIR
    expanded[sl] = region
    return expanded, (padding, padding, padding), mg_levels


def expand_face_weights(
    base_weights: Sequence[np.ndarray],
    expanded_shape: Sequence[int],
    offset: Sequence[int],
) -> list[np.ndarray]:
    """Copy per-axis face weights into the expanded index space (zero elsewhere).

    Weights exist only at the finest level.
    Reference: Source/HDK_GeometricMultigridOperators.h:1458-1572.
    """
    out = []
    for axis in range(3):
        w = np.asarray(base_weights[axis], dtype=np.float64)
        expanded = np.zeros(face_shape(expanded_shape, axis), dtype=np.float64)
        sl = []
        for a in range(3):
            extent = w.shape[a]
            sl.append(slice(offset[a], offset[a] + extent))
        expanded[tuple(sl)] = w
        out.append(expanded)
    return out


def _neighbor_label_views(labels: np.ndarray):
    """Yield (axis, direction, neighbor_view, center_view) for all 6 directions.

    Views cover the interior slab where the neighbor exists; cells on the
    domain edge are excluded (the expanded domain guarantees solvable cells
    never sit on the edge).
    """
    for axis in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        lo, hi = tuple(lo), tuple(hi)
        # direction 0: neighbor at -1 along axis; center view excludes first slab
        yield axis, 0, labels[lo], labels[hi]
        # direction 1: neighbor at +1 along axis; center view excludes last slab
        yield axis, 1, labels[hi], labels[lo]


def _count_adjacent(labels: np.ndarray, predicate) -> np.ndarray:
    """Per-cell count of the 6 face neighbors satisfying `predicate`.

    Out-of-bounds neighbors do not count.
    """
    count = np.zeros(labels.shape, dtype=np.int8)
    for axis, direction, nbr, _ in _neighbor_label_views(labels):
        sl = [slice(None)] * 3
        sl[axis] = slice(1, None) if direction == 0 else slice(0, -1)
        count[tuple(sl)] += predicate(nbr).astype(np.int8)
    return count


def set_boundary_labels(labels: np.ndarray, face_weights: Sequence[np.ndarray] | None) -> np.ndarray:
    """Relabel INTERIOR -> BOUNDARY next to Dirichlet/exterior cells or non-unit weights.

    Reference: Source/HDK_GeometricMultigridOperators.h:1574-1644.
    """
    labels = np.array(labels, dtype=LABEL_DTYPE, copy=True)
    touches = _count_adjacent(labels, lambda l: (l == DIR) | (l == EXT)) > 0
    if face_weights is not None:
        for axis in range(3):
            w = np.asarray(face_weights[axis])
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[axis] = slice(0, -1)
            hi[axis] = slice(1, None)
            touches |= w[tuple(lo)] != 1  # lower face of each cell
            touches |= w[tuple(hi)] != 1  # upper face of each cell
    boundary = (labels == INT) & touches
    labels[boundary] = BND
    return labels


def coarsen_labels(fine_labels: np.ndarray) -> np.ndarray:
    """One level of label coarsening (8-children vote + boundary pass).

    Any DIRICHLET child -> DIRICHLET; else any solvable child -> INTERIOR;
    else EXTERIOR.  Then INTERIOR cells face-adjacent to DIRICHLET/EXTERIOR
    become BOUNDARY.  Coarse levels carry no fractional weights.
    Reference: Source/HDK_GeometricMultigridOperators.cpp:23-163.
    """
    fine_labels = np.asarray(fine_labels)
    assert all(s % 2 == 0 for s in fine_labels.shape), fine_labels.shape
    nx, ny, nz = (s // 2 for s in fine_labels.shape)
    children = fine_labels.reshape(nx, 2, ny, 2, nz, 2)
    has_dirichlet = (children == DIR).any(axis=(1, 3, 5))
    has_interior = is_solvable(children).any(axis=(1, 3, 5))
    coarse = np.where(has_dirichlet, DIR, np.where(has_interior, INT, EXT)).astype(LABEL_DTYPE)
    return set_boundary_labels(coarse, None)


def boundary_band(labels: np.ndarray, width: int) -> np.ndarray:
    """Dense mask of the boundary smoothing band.

    Seeds are all BOUNDARY cells; each of the remaining `width - 1` layers
    expands through unvisited INTERIOR face neighbors (BFS through INTERIOR
    only).  Replaces the reference's sorted explicit cell list with a mask.
    Reference: Source/HDK_GeometricMultigridOperators.cpp:165-469.
    """
    labels = np.asarray(labels)
    visited = labels == BND
    frontier = visited.copy()
    for _ in range(width - 1):
        dilated = np.zeros_like(frontier)
        for axis in range(3):
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[axis] = slice(0, -1)
            hi[axis] = slice(1, None)
            lo, hi = tuple(lo), tuple(hi)
            dilated[lo] |= frontier[hi]
            dilated[hi] |= frontier[lo]
        frontier = dilated & (labels == INT) & ~visited
        if not frontier.any():
            break
        visited |= frontier
    return visited


def build_level_coefficients(
    labels: np.ndarray,
    face_weights: Sequence[np.ndarray] | None,
    boundary_width: int,
) -> dict[str, np.ndarray]:
    """Precompute static stencil coefficient grids for one multigrid level.

    The reference recomputes the per-cell Laplacian coefficients from labels
    and weights inside every smoother application
    (Source/HDK_GeometricMultigridOperators.h:177-260).  Since labels and
    weights are fixed for a solve, we bake them once into:

      * ``diag``      -- stencil diagonal: sum over faces of w_f for
                         neighbors in {INTERIOR, BOUNDARY, DIRICHLET}
                         (6.0 on INTERIOR cells), 0 on non-solvable cells.
      * ``inv_diag``  -- 1/diag on solvable cells, 0 elsewhere (doubles as
                         the solvable mask for smoother updates).
      * ``ew[axis]``  -- off-diagonal edge weights stored cell-shaped:
                         ``ew[axis][..., i, ...]`` is w_f of the face between
                         cell i and i+1 along `axis` where both cells are
                         solvable, else 0 (the last entry is the domain-edge
                         face, always 0).  Cell-shaped storage keeps every
                         hot-loop array the same shape for SPMD sharding.
      * ``solvable``  -- bool DOF mask.
      * ``band``      -- bool boundary smoothing band mask.

    On coarse levels (face_weights=None) all face weights are implicitly 1.
    """
    labels = np.asarray(labels)
    solvable = is_solvable(labels)
    diag = np.zeros(labels.shape, dtype=np.float64)
    edge_weights = []
    for axis in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        lo, hi = tuple(lo), tuple(hi)

        w = np.ones(face_shape(labels.shape, axis), dtype=np.float64)
        if face_weights is not None:
            w = np.asarray(face_weights[axis], dtype=np.float64)

        # Interior faces of the grid: face f (1..n-1 along axis) sits between
        # cell f-1 (view `lo` of cells) and cell f (view `hi`).
        interior_faces = [slice(None)] * 3
        interior_faces[axis] = slice(1, -1)
        interior_faces = tuple(interior_faces)

        lo_lbl = labels[lo]  # cell below the face
        hi_lbl = labels[hi]  # cell above the face
        wf = w[interior_faces]

        counts = (lo_lbl != EXT) & (hi_lbl != EXT)
        ew = np.where(is_solvable(lo_lbl) & is_solvable(hi_lbl), wf, 0.0)
        # Stored cell-shaped: entry i is the off-diagonal weight of the face
        # between cell i and cell i+1 (the last entry is the domain-edge
        # face, always 0 thanks to the exterior shell).  Cell-shaped
        # coefficients keep every hot-loop array uniformly shardable.
        cell_ew = np.zeros(labels.shape, dtype=np.float64)
        sl = [slice(None)] * 3
        sl[axis] = slice(0, -1)
        cell_ew[tuple(sl)] = ew
        edge_weights.append(cell_ew)

        # Diagonal contributions: the face contributes w_f to the diagonal of
        # each adjacent *solvable* cell whenever the opposite cell is not
        # EXTERIOR (INTERIOR/BOUNDARY/DIRICHLET all count; reference
        # computeLaplacian, Source/HDK_GeometricMultigridOperators.h:177-260).
        contrib = np.where(counts, wf, 0.0)
        diag[lo] += np.where(is_solvable(lo_lbl), contrib, 0.0)
        diag[hi] += np.where(is_solvable(hi_lbl), contrib, 0.0)

    diag[~solvable] = 0.0
    inv_diag = np.zeros_like(diag)
    good = solvable & (diag > 0)
    inv_diag[good] = 1.0 / diag[good]

    return {
        "labels": labels,
        "solvable": solvable,
        "band": boundary_band(labels, boundary_width),
        "diag": diag,
        "inv_diag": inv_diag,
        "ew": edge_weights,
    }


def build_label_hierarchy(
    expanded_labels: np.ndarray,
    mg_levels: int,
    max_levels: int | None = None,
) -> list[np.ndarray]:
    """Coarsen labels level by level, capping when a level has no DOFs.

    Reference caps `myMGLevels` when a coarse level has no solvable cell
    (Source/HDK_GeometricMultigridPoissonSolver.cpp:243-248).
    """
    if max_levels is not None:
        mg_levels = min(mg_levels, max_levels)
    levels = [np.asarray(expanded_labels, dtype=LABEL_DTYPE)]
    for _ in range(1, mg_levels):
        coarse = coarsen_labels(levels[-1])
        if not is_solvable(coarse).any():
            break
        levels.append(coarse)
    return levels


# ---------------------------------------------------------------------------
# Invariant checks (reference built-in unit tests)
# ---------------------------------------------------------------------------


def check_exterior_shell(labels: np.ndarray) -> bool:
    """All six outer faces of the grid must be fully EXTERIOR.

    Reference unitTestExteriorCells
    (Source/HDK_GeometricMultigridOperators.cpp:602-632).
    """
    labels = np.asarray(labels)
    for axis in range(3):
        for idx in (0, -1):
            sl = [slice(None)] * 3
            sl[axis] = idx
            if not (labels[tuple(sl)] == EXT).all():
                return False
    return True


def check_coarsening(fine: np.ndarray, coarse: np.ndarray) -> bool:
    """Fine<->coarse label consistency in both directions.

    Mirrors reference unitTestCoarsening
    (Source/HDK_GeometricMultigridOperators.cpp:471-600):
      * coarse equals an independent recoarsening of fine;
      * coarse DIRICHLET  => at least one DIRICHLET child;
      * coarse solvable   => at least one solvable child, no DIRICHLET child;
      * coarse EXTERIOR   => at least one EXTERIOR child, no DIRICHLET or
                             solvable child;
      * fine solvable     => parent not EXTERIOR (a Dirichlet sibling may
                             have voted the parent DIRICHLET);
      * fine DIRICHLET    => parent DIRICHLET.
    """
    fine = np.asarray(fine)
    coarse = np.asarray(coarse)
    if tuple(2 * np.asarray(coarse.shape)) != fine.shape:
        return False
    if not np.array_equal(coarse, coarsen_labels(fine)):
        return False

    nx, ny, nz = coarse.shape
    children = fine.reshape(nx, 2, ny, 2, nz, 2)
    has_dir = (children == DIR).any(axis=(1, 3, 5))
    has_solv = is_solvable(children).any(axis=(1, 3, 5))
    all_ext = (children == EXT).all(axis=(1, 3, 5))

    if not has_dir[coarse == DIR].all():
        return False
    coarse_solv = is_solvable(coarse)
    if not (has_solv[coarse_solv] & ~has_dir[coarse_solv]).all():
        return False
    if not all_ext[coarse == EXT].all():
        return False

    parent = coarse.repeat(2, axis=0).repeat(2, axis=1).repeat(2, axis=2)
    if (parent[is_solvable(fine)] == EXT).any():
        return False
    if not (parent[fine == DIR] == DIR).all():
        return False
    return True


def check_boundary_cells(
    labels: np.ndarray, face_weights: Sequence[np.ndarray] | None
) -> bool:
    """Every INTERIOR cell is fully regular; every BOUNDARY cell is justified.

    Mirrors reference unitTestBoundaryCells
    (Source/HDK_GeometricMultigridOperators.h:1771-1870).
    """
    labels = np.asarray(labels)
    interior = labels == INT

    irregular = _count_adjacent(labels, lambda l: (l == DIR) | (l == EXT)) > 0
    if face_weights is not None:
        for axis in range(3):
            w = np.asarray(face_weights[axis])
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[axis] = slice(0, -1)
            hi[axis] = slice(1, None)
            irregular |= w[tuple(lo)] != 1
            irregular |= w[tuple(hi)] != 1

    if irregular[interior].any():
        return False
    boundary = labels == BND
    if (~irregular[boundary]).any():
        return False
    # Edge cells can never be solvable (no out-of-bounds stencil reads).
    if not check_exterior_shell(np.where(is_solvable(labels), labels, EXT)):
        return False
    return True
