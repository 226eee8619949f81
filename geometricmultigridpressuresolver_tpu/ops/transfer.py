"""Inter-level transfer operators: restriction and prolongation (JAX).

Reference: downsample (full-weighting, separable 1D weights
[1/8, 3/8, 3/8, 1/8] over a 4^3 fine window centered at 2*cell - 1,
Source/HDK_GeometricMultigridOperators.h:734-835) and upsampleAndAdd
(trilinear interpolation at samplePoint = (cell + 0.5)/2 - 0.5 scaled by 4,
h:873-972).  The 4x accounts for the factored-out dx^2 between levels; the
interpolation weights are kept hand-rolled/symmetric exactly like the
reference's custom lerp (h:837-871): per axis, prolongation is 2x the
transpose of restriction, so the pair stays adjoint to machine precision.

Both operators assume fields are identically zero outside the solvable set
(the reference asserts this in debug builds) and mask their output to the
destination level's solvable set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Separable full-weighting restriction stencil.
_R_WEIGHTS = (1.0 / 8.0, 3.0 / 8.0, 3.0 / 8.0, 1.0 / 8.0)


def _restrict_axis(x: jax.Array, axis: int) -> jax.Array:
    """1D full-weighting along `axis`: y[c] = sum_k w[k] * x[2c - 1 + k]."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)

    def sl(start):
        s = [slice(None)] * x.ndim
        s[axis] = slice(start, start + n - 1, 2)
        return xp[tuple(s)]

    w = _R_WEIGHTS
    dtype = x.dtype
    return (
        dtype.type(w[0]) * sl(0)
        + dtype.type(w[1]) * sl(1)
        + dtype.type(w[2]) * sl(2)
        + dtype.type(w[3]) * sl(3)
    )


def restrict(fine: jax.Array, coarse_solvable: jax.Array) -> jax.Array:
    """Full-weighting restriction, masked to the coarse solvable set.

    The coarse grid may carry trailing EXTERIOR lane padding
    (ops.domain.coarse_lane_pad); the natural half-resolution result is
    zero-padded to the coarse shape.  Padding with zeros is the exact
    transpose of the slice `prolong_add` applies, so the pair stays adjoint.
    """
    out = fine
    for axis in range(3):
        out = _restrict_axis(out, axis)
    if out.shape != coarse_solvable.shape:
        pad = [
            (0, cs - os)
            for os, cs in zip(out.shape, coarse_solvable.shape)
        ]
        out = jnp.pad(out, pad)
    return jnp.where(coarse_solvable, out, jnp.zeros_like(out))


def _prolong_axis(x: jax.Array, axis: int) -> jax.Array:
    """1D linear upsampling along `axis` (2x the restriction transpose).

    out[2c]   = 0.25 * x[c-1] + 0.75 * x[c]
    out[2c+1] = 0.75 * x[c]   + 0.25 * x[c+1]
    """
    c = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)

    def sl(start):
        s = [slice(None)] * x.ndim
        s[axis] = slice(start, start + c)
        return xp[tuple(s)]

    dtype = x.dtype
    q, t = dtype.type(0.25), dtype.type(0.75)
    even = q * sl(0) + t * sl(1)
    odd = t * sl(1) + q * sl(2)
    stacked = jnp.stack((even, odd), axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * c
    return stacked.reshape(new_shape)


def prolong(coarse: jax.Array) -> jax.Array:
    """Trilinear interpolation of a coarse field onto the fine grid, scaled 4x."""
    out = coarse
    for axis in range(3):
        out = _prolong_axis(out, axis)
    return out.dtype.type(4.0) * out


def prolong_add(
    fine_x: jax.Array, coarse_x: jax.Array, fine_solvable: jax.Array
) -> jax.Array:
    """fine_x += 4 * trilerp(coarse_x), masked to the fine solvable set.

    If the coarse grid carries trailing lane padding, only its natural
    (fine/2) region is interpolated (the transpose of `restrict`'s pad).
    """
    natural = tuple(s // 2 for s in fine_x.shape)
    if coarse_x.shape != natural:
        coarse_x = coarse_x[tuple(slice(0, s) for s in natural)]
    up = prolong(coarse_x)
    return jnp.where(fine_solvable, fine_x + up, fine_x)
