"""Domain construction + invariant tests (reference built-in unit tests).

Fixtures mirror the reference test node's synthetic domains
(Source/HDK_TestGeometricMultigrid.cpp:466-625 buildSimpleDomain,
cpp:233-461 buildComplexDomain).
"""

import numpy as np
import pytest

from geometricmultigridpressuresolver_tpu.grids import CellLabel, face_shape
from geometricmultigridpressuresolver_tpu.ops import domain

EXT, DIR, INT, BND = (
    int(CellLabel.EXTERIOR),
    int(CellLabel.DIRICHLET),
    int(CellLabel.INTERIOR),
    int(CellLabel.BOUNDARY),
)


def simple_domain(n, dirichlet_band=1):
    """Cube of INTERIOR wrapped in a Dirichlet shell (buildSimpleDomain)."""
    labels = np.full((n, n, n), DIR, dtype=np.int8)
    b = dirichlet_band
    labels[b:-b, b:-b, b:-b] = INT
    return labels


def sine_dirichlet_domain(n):
    """Sine-wave implicit Dirichlet surface (buildComplexDomain flavor)."""
    x, y, z = np.meshgrid(*[(np.arange(n) + 0.5) / n] * 3, indexing="ij")
    phi = x - 0.5 + 0.25 * np.sin(2 * np.pi * y + 4 * np.pi * z)
    labels = np.where(phi <= 0, INT, DIR).astype(np.int8)
    return labels


def test_expansion_params_64():
    mg_levels, padding, expanded = domain.expansion_params((64, 64, 64))
    assert mg_levels == 5
    assert padding == 16
    assert expanded == (128, 128, 128)


def test_expansion_params_anisotropic():
    mg_levels, padding, expanded = domain.expansion_params((64, 32, 48))
    # min dim 32 -> mg_levels = 4, padding 8
    assert mg_levels == 4
    assert padding == 8
    assert expanded == (128, 64, 64)


@pytest.mark.parametrize("builder", [simple_domain, sine_dirichlet_domain])
def test_hierarchy_invariants(builder):
    base = builder(32)
    expanded, offset, mg_levels = domain.expand_domain(base)
    assert domain.check_exterior_shell(expanded)

    # Unit face weights on faces touching interior cells, as in the simple
    # test domain; then relabel boundaries.
    weights = []
    for axis in range(3):
        w = np.zeros(face_shape(expanded.shape, axis))
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        interior_faces = [slice(None)] * 3
        interior_faces[axis] = slice(1, -1)
        touch = (expanded[tuple(lo)] != EXT) & (expanded[tuple(hi)] != EXT)
        w[tuple(interior_faces)] = touch.astype(float)
        weights.append(w)

    labeled = domain.set_boundary_labels(expanded, weights)
    assert domain.check_boundary_cells(labeled, weights)

    hierarchy = domain.build_label_hierarchy(labeled, mg_levels)
    assert len(hierarchy) >= 2
    for fine, coarse in zip(hierarchy, hierarchy[1:]):
        assert domain.check_coarsening(fine, coarse)
        assert domain.check_boundary_cells(coarse, None)
        assert domain.check_exterior_shell(coarse)


def test_boundary_band_width():
    base = simple_domain(32)
    expanded, _, _ = domain.expand_domain(base)
    labeled = domain.set_boundary_labels(expanded, None)
    band1 = domain.boundary_band(labeled, 1)
    band3 = domain.boundary_band(labeled, 3)
    assert np.array_equal(band1, labeled == BND)
    assert band3.sum() > band1.sum()
    # Width-3 band = boundary cells plus two interior layers: for the cube
    # domain that is exactly the 3 outermost interior shells.
    inner = labeled == INT
    assert band3[inner].sum() > 0
    # band only covers solvable cells
    assert not band3[(labeled == EXT) | (labeled == DIR)].any()


def test_level_coefficients_interior_diag():
    base = simple_domain(16)
    expanded, _, mg_levels = domain.expand_domain(base)
    labeled = domain.set_boundary_labels(expanded, None)
    coeffs = domain.build_level_coefficients(labeled, None, 3)
    diag = coeffs["diag"]
    assert (diag[labeled == INT] == 6.0).all()
    assert (diag[labeled == BND] > 0).all()
    assert (diag[(labeled == EXT) | (labeled == DIR)] == 0).all()
    # Cell-shaped edge weights: entry i along the axis is the weight of the
    # face between cell i and i+1; it vanishes unless both cells are solvable.
    for axis in range(3):
        ew = coeffs["ew"][axis]
        assert ew.shape == labeled.shape
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        both_solvable = (labeled[tuple(lo)] >= INT) & (labeled[tuple(hi)] >= INT)
        ew_faces = ew[tuple(lo)]
        assert (ew_faces[~both_solvable] == 0).all()
        assert (ew_faces[both_solvable] == 1).all()
        # Domain-edge entry is always zero.
        edge = [slice(None)] * 3
        edge[axis] = -1
        assert (ew[tuple(edge)] == 0).all()


def test_level_capping():
    # A domain with a single tiny blob of interior cells: coarse levels
    # quickly run out of solvable cells only if the blob vanishes; with
    # vote-based coarsening the blob persists, so just check the cap logic
    # doesn't produce empty levels.
    base = np.full((16, 16, 16), DIR, dtype=np.int8)
    base[7:9, 7:9, 7:9] = INT
    expanded, _, mg_levels = domain.expand_domain(base)
    labeled = domain.set_boundary_labels(expanded, None)
    hierarchy = domain.build_label_hierarchy(labeled, mg_levels)
    for lv in hierarchy:
        assert (lv >= INT).any()


def test_align_tile_extents_rules():
    """Window alignment for the fused kernels: lane axis rounds to 128
    multiples from extent 96 up; dims 0/1 stay minimal (measured: inflating
    them costs more in non-kernel passes than larger tiles win back)."""
    from geometricmultigridpressuresolver_tpu.ops.domain import align_tile_extents

    # Below the gate: untouched.
    assert align_tile_extents((72, 68, 72), 8) == (72, 68, 72)
    # 128^3-class window: lane axis 144 -> 256; dims 0/1 unchanged.
    assert align_tile_extents((144, 136, 144), 8) == (144, 136, 256)
    # Already aligned: idempotent.
    assert align_tile_extents((288, 256, 384), 16) == (288, 256, 384)
    assert align_tile_extents(
        align_tile_extents((144, 136, 150), 8), 8
    ) == align_tile_extents((144, 136, 150), 8)


def test_plan_tiles_and_block_list_geometry():
    """plan_tiles divides interior extents; solvable_block_list covers all
    solvable cells with active blocks and nothing is listed twice."""
    import jax.numpy as jnp

    from geometricmultigridpressuresolver_tpu.ops import pallas_smoother as ps

    shape = (80, 64, 128)
    tb, yb = ps.plan_tiles(shape, 4, 32, 48)
    rx, ry = shape[0] - 2 * ps.H, shape[1] - 2 * ps.H
    assert rx % tb == 0 and ry % yb == 0
    assert tb % 8 == 0 and yb % 8 == 0

    solvable = np.zeros(shape, dtype=bool)
    solvable[ps.H + 4 : ps.H + 20, ps.H + 2 : ps.H + 10, 30:90] = True
    bx, by, na = ps.solvable_block_list(jnp.asarray(solvable), tb, yb)
    na = int(na)
    assert 0 < na <= bx.shape[0]
    seen = set()
    covered = np.zeros(shape, dtype=bool)
    for k in range(na):
        key = (int(bx[k]), int(by[k]))
        assert key not in seen, "duplicate block in compacted list"
        seen.add(key)
        ox, oy = key[0] * tb, key[1] * yb
        covered[ps.H + ox : ps.H + ox + tb, ps.H + oy : ps.H + oy + yb, :] = True
    assert (covered | ~solvable).all(), "solvable cell not covered"

    # Dense fallback covers everything.
    dbx, dby, dna = ps._dense_block_list(rx, ry, tb, yb)
    assert int(dna) == dbx.shape[0] == (rx // tb) * (ry // yb)
