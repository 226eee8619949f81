"""Shared synthetic-domain fixtures, mirroring the reference test node's
buildSimpleDomain / buildComplexDomain generators
(Source/HDK_TestGeometricMultigrid.cpp:466-625, 233-461)."""

import numpy as np

from geometricmultigridpressuresolver_tpu.grids import CellLabel, face_shape
from geometricmultigridpressuresolver_tpu.ops import domain

EXT, DIR, INT, BND = (
    int(CellLabel.EXTERIOR),
    int(CellLabel.DIRICHLET),
    int(CellLabel.INTERIOR),
    int(CellLabel.BOUNDARY),
)


def simple_domain(n, dirichlet_band=1):
    labels = np.full((n, n, n), DIR, dtype=np.int8)
    b = dirichlet_band
    labels[b:-b, b:-b, b:-b] = INT
    return labels


def sine_dirichlet_domain(n):
    x, y, z = np.meshgrid(*[(np.arange(n) + 0.5) / n] * 3, indexing="ij")
    phi = x - 0.5 + 0.25 * np.sin(2 * np.pi * y + 4 * np.pi * z)
    return np.where(phi <= 0, INT, DIR).astype(np.int8)


def unit_weights(labels):
    """Face weights: 1 on faces between two non-exterior cells, else 0."""
    weights = []
    for axis in range(3):
        w = np.zeros(face_shape(labels.shape, axis))
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        interior = [slice(None)] * 3
        interior[axis] = slice(1, -1)
        touch = (labels[tuple(lo)] != EXT) & (labels[tuple(hi)] != EXT)
        w[tuple(interior)] = touch.astype(float)
        weights.append(w)
    return weights


def expanded_domain(base_builder, n, fractional=False, seed=0):
    """Expanded + relabeled domain with optional random fractional weights.

    Returns (labels, weights, mg_levels).  Fractional weights emulate
    cut-cell faces: a random subset of faces touching solvable cells gets a
    weight in (0.25, 1), which forces BOUNDARY relabeling around them.
    """
    base = base_builder(n)
    expanded, _, mg_levels = domain.expand_domain(base)
    weights = unit_weights(expanded)
    if fractional:
        rng = np.random.default_rng(seed)
        for axis in range(3):
            w = weights[axis]
            mask = (w == 1.0) & (rng.random(w.shape) < 0.2)
            w[mask] = 0.25 + 0.75 * rng.random(w.shape)[mask]
    labels = domain.set_boundary_labels(expanded, weights)
    assert domain.check_boundary_cells(labels, weights)
    return labels, weights, mg_levels


def random_solvable_field(labels, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(labels.shape)
    x[labels < INT] = 0.0
    return x
