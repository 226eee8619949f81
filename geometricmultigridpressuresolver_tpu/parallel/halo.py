"""Halo exchange for spatial domain decomposition (inside shard_map).

The 7-point stencil (and the fused multi-pass smoother, which consumes an
8-cell halo) needs neighbor-block boundary layers.  `jax.lax.ppermute`
shifts boundary slabs along each sharded mesh axis; destinations with no
source (the mesh edges) receive ZEROS, which is exactly the multigrid
domain's exterior boundary condition (fields are identically zero outside
the solvable set), so no special-casing is needed at the domain edges.

This is the SURVEY.md section 2.10/2.11 design realized explicitly: halo
exchange via ppermute over ICI, composable with psum reductions, instead
of relying on the GSPMD partitioner to infer the same communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exchange_halo_axis(
    blk: jax.Array, h: int, axis: int, axis_name: str, mesh_size: int
) -> jax.Array:
    """Grow `blk` by h cells of neighbor data on each side along `axis`.

    Must run inside shard_map.  Mesh-edge blocks receive zero halos.
    """
    sl_hi = [slice(None)] * blk.ndim
    sl_hi[axis] = slice(blk.shape[axis] - h, blk.shape[axis])
    sl_lo = [slice(None)] * blk.ndim
    sl_lo[axis] = slice(0, h)

    fwd = [(i, i + 1) for i in range(mesh_size - 1)]  # block i -> i+1
    bwd = [(i + 1, i) for i in range(mesh_size - 1)]  # block i+1 -> i
    # Our high boundary becomes the right neighbor's low halo, and vice
    # versa; blocks with no neighbor get zeros from ppermute.
    low_halo = jax.lax.ppermute(blk[tuple(sl_hi)], axis_name, fwd)
    high_halo = jax.lax.ppermute(blk[tuple(sl_lo)], axis_name, bwd)
    return jnp.concatenate([low_halo, blk, high_halo], axis=axis)


def exchange_halos(
    blk: jax.Array, h: int, sharded_axes: tuple[tuple[int, str, int], ...]
) -> jax.Array:
    """Exchange h-cell halos along every (axis, mesh_axis_name, mesh_size).

    Corner/edge halo regions are filled transitively: exchanging axis 1
    after axis 0 transports axis-0 halos sideways, so the diagonal-neighbor
    data a multi-pass stencil needs arrives without explicit corner sends.
    """
    for axis, name, size in sharded_axes:
        blk = exchange_halo_axis(blk, h, axis, name, size)
    return blk
