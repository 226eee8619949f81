"""Synthetic signed-distance fields and cut-cell face weights.

Scene generators for tests and benchmarks, standing in for the Houdini
fields the reference nodes consume (and for the test node's own generators,
Source/HDK_TestGeometricMultigrid.cpp:233-360: sine-wave Dirichlet surface,
solid sphere with cut-cell weights via computeSDFWeightsFace, domain-edge
faces zeroed).

Conventions:
  * liquid SDF `phi`: cell-centered, <= 0 inside the liquid;
  * solid SDF: cell-centered samples, >= 0 inside the solid (matches the
    reference's isCellLiquid check `solidSurface.getValue(pos) >= 0`,
    Source/HDK_Utilities.cpp:26; the node default of -10*dx means
    "no solid anywhere").
  * cut-cell weight: fraction of the face open to fluid, in [0, 1]; small
    weights are clamped to zero (reference clamps below .01,
    Source/HDK_TestGeometricMultigrid.cpp:321).
"""

from __future__ import annotations

import numpy as np

from geometricmultigridpressuresolver_tpu.grids import face_shape


def cell_centers(shape, dx: float = None):
    """Cell-center coordinates in [0,1]^3 (dx = 1/max(shape) by default)."""
    if dx is None:
        dx = 1.0 / max(shape)
    axes = [(np.arange(s) + 0.5) * dx for s in shape]
    return np.meshgrid(*axes, indexing="ij"), dx


def sphere_sdf(points, center, radius):
    x, y, z = points
    return np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2 + (z - center[2]) ** 2) - radius


def pool_sdf(points, height):
    """Liquid pool filling the domain below `height` (phi <= 0 in liquid)."""
    return points[1] - height


def splash_scene(shape, pool_height=0.35, drop_center=(0.5, 0.7, 0.5), drop_radius=0.15):
    """flipSplash-style scene: a pool plus a falling liquid drop.

    Returns (liquid_phi, velocity) where the drop carries downward velocity.
    """
    points, dx = cell_centers(shape)
    phi_pool = pool_sdf(points, pool_height)
    phi_drop = sphere_sdf(points, drop_center, drop_radius)
    liquid_phi = np.minimum(phi_pool, phi_drop)

    velocity = []
    for axis in range(3):
        coords = []
        for a in range(3):
            n = shape[a] + (1 if a == axis else 0)
            offset = 0.0 if a == axis else 0.5
            coords.append((np.arange(n) + offset) * dx)
        gx, gy, gz = np.meshgrid(*coords, indexing="ij")
        if axis == 0:
            # Compressive x-component: nonzero divergence everywhere.
            v = 0.3 * np.sin(2.0 * np.pi * gx)
        elif axis == 1:
            # Downward velocity inside the falling drop only, so drop-surface
            # cells see a velocity jump.
            v = np.where(sphere_sdf((gx, gy, gz), drop_center, drop_radius) <= 0, -1.0, 0.0)
        else:
            v = np.zeros(face_shape(shape, axis))
        velocity.append(v)
    return liquid_phi, velocity


def face_weights_from_solid(
    solid_fn, shape, dx: float = None, clamp: float = 0.01, samples: int = 4
):
    """Cut-cell face weights: supersampled fraction of each face open to fluid.

    `solid_fn((x, y, z)) -> phi` with phi >= 0 inside the solid.  Each face
    is sampled on a `samples x samples` grid; the weight is the fraction of
    samples with phi < 0.  Weights below `clamp` become 0; domain-boundary
    faces are zeroed (closed-box convention, as in the reference test scene,
    Source/HDK_TestGeometricMultigrid.cpp:345-360).
    """
    if dx is None:
        dx = 1.0 / max(shape)
    offsets = (np.arange(samples) + 0.5) / samples
    weights = []
    for axis in range(3):
        fshape = face_shape(shape, axis)
        coords = []
        for a in range(3):
            if a == axis:
                coords.append(np.arange(fshape[a]) * dx)  # face planes
            else:
                coords.append(np.arange(fshape[a]) * dx)  # cell lower corners
        w = np.zeros(fshape)
        tangent = [a for a in range(3) if a != axis]
        for o1 in offsets:
            for o2 in offsets:
                shift = [0.0, 0.0, 0.0]
                shift[tangent[0]] = o1 * dx
                shift[tangent[1]] = o2 * dx
                grid = np.meshgrid(
                    coords[0] + shift[0], coords[1] + shift[1], coords[2] + shift[2],
                    indexing="ij",
                )
                w += (solid_fn(grid) < 0).astype(np.float64)
        w /= samples * samples
        w[w < clamp] = 0.0

        # Close the domain boundary faces.
        edge = [slice(None)] * 3
        edge[axis] = 0
        w[tuple(edge)] = 0.0
        edge[axis] = -1
        w[tuple(edge)] = 0.0
        weights.append(w)
    return weights


def open_box_weights(shape):
    """Unit weights everywhere except closed domain-boundary faces."""
    return face_weights_from_solid(lambda pts: np.full_like(pts[0], -1.0), shape, samples=1)
