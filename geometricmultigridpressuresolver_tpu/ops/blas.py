"""Masked grid BLAS (JAX).

Reference: dotProduct / l2Norm / squaredL2Norm / infNorm / addToVector /
addVectors / scaleVector over INTERIOR+BOUNDARY cells only
(Source/HDK_GeometricMultigridOperators.h:974-1326).  The reference
accumulates per-tile partials in a fixed order to keep reductions
deterministic; XLA reductions are likewise deterministic for a fixed
compiled program, which preserves reproducible CG trajectories.

Fields are maintained zero outside the solvable set, but reductions still
mask defensively so stray values in non-solvable cells can never leak in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(x: jax.Array, y: jax.Array, solvable: jax.Array) -> jax.Array:
    xy = x * y
    return jnp.sum(jnp.where(solvable, xy, jnp.zeros_like(xy)))


def squared_l2_norm(x: jax.Array, solvable: jax.Array) -> jax.Array:
    return dot(x, x, solvable)


def l2_norm(x: jax.Array, solvable: jax.Array) -> jax.Array:
    return jnp.sqrt(squared_l2_norm(x, solvable))


def inf_norm(x: jax.Array, solvable: jax.Array) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.max(jnp.where(solvable, ax, jnp.zeros_like(ax)))


def scale(x: jax.Array, s) -> jax.Array:
    """s * x (reference scaleVector,
    Source/HDK_GeometricMultigridOperators.h:974-1018)."""
    return s * x


def axpy(y: jax.Array, scale, x: jax.Array) -> jax.Array:
    """y + scale * x (reference addToVector)."""
    return y + scale * x


def xpay(x: jax.Array, scale, y: jax.Array) -> jax.Array:
    """x + scale * y (reference addVectors with scaled z)."""
    return x + scale * y


def masked_mean(x: jax.Array, solvable: jax.Array) -> jax.Array:
    """Mean over solvable cells (null-space projection for all-Neumann)."""
    count = jnp.sum(solvable.astype(x.dtype))
    return dot(x, jnp.ones_like(x), solvable) / jnp.maximum(count, x.dtype.type(1))


def project_null_space(x: jax.Array, solvable: jax.Array) -> jax.Array:
    """Subtract the solvable-set mean (reference doProjectNullSpace,
    Source/HDK_Utilities.h:197-297)."""
    mean = masked_mean(x, solvable)
    return jnp.where(solvable, x - mean, x)
