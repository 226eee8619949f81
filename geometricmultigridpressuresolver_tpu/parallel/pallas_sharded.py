"""Multi-chip fused smoother: shard_map + halo exchange + the Pallas kernel.

Single-chip, the fused smoothing kernel (ops.pallas_smoother) executes the
whole boundary^3/GS/boundary^3 pass stack in one HBM round trip.  This
module runs the SAME kernel per device block under `jax.shard_map`:

  1. every input grid gains an H-cell halo of neighbor data along each
     sharded mesh axis (parallel/halo.py; ppermute over ICI, zeros at the
     domain edges -- exactly the exterior boundary condition);
  2. the kernel runs on the haloed block: its "no solvable cells in the
     outer H shells" precondition holds by construction, because the outer
     H cells ARE the halo (owned and updated by the neighbors);
  3. the core is sliced back out.

Because the halo depth equals the pass-stack depth, each pass k inside the
kernel sees exactly the global pass-(k-1) values in its remaining-valid
region -- the sharded result equals the single-device schedule to fp
rounding, so the preconditioner stays symmetric and deterministic.

The lane (z) axis must stay unsharded (the kernel uses full-z slabs with
128-aligned DMA); use a (mx, my, 1) mesh for the Pallas path.  Falls back
to the jnp operators under GSPMD otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from geometricmultigridpressuresolver_tpu.ops import pallas_smoother
from geometricmultigridpressuresolver_tpu.parallel.halo import exchange_halos

H = pallas_smoother.H


def _level_spec(mesh, shape, min_per_device: int = 8) -> PartitionSpec:
    from geometricmultigridpressuresolver_tpu.parallel.mesh import grid_pspec

    return grid_pspec(mesh, shape, min_per_device)


def sharded_eligible(shape, spec: PartitionSpec, mesh, level, num_levels) -> bool:
    """Kernel geometry preconditions for the sharded path.

    Sharded axes need local cores of at least the halo depth H that tile
    into slabs (halos replace the shell requirement); unsharded axes keep
    the single-device conditions.  The lane axis must be unsharded and
    128-aligned.
    """
    nx, ny, nz = shape
    if spec[2] is not None or nz % 128:
        return False
    for axis, n in ((0, nx), (1, ny)):
        name = spec[axis]
        if name is None:
            # Unsharded: the global outer-H shells must be non-solvable
            # (the single-device padding rule).
            if 2 ** (num_levels - 1 - level) < H:
                return False
            r = n - 2 * H
        else:
            if n % mesh.shape[name]:
                return False
            r = n // mesh.shape[name]
            if r < H:  # exchange_halo_axis slices blk[r-H:]
                return False
        if r < 8 or r % 8:
            return False
    return True


def _sharded_axes_for(mesh, spec):
    return tuple(
        (axis, spec[axis], mesh.shape[spec[axis]])
        for axis in range(3)
        if spec[axis] is not None and mesh.shape[spec[axis]] > 1
    )


def prehalo_coeffs(coeffs, mesh):
    """Exchange the five constant coefficient halos ONCE per solve.

    The smoother coefficients (inv_diag, ew0..2, band) never change during
    a solve, yet the naive path re-exchanged them on every smoother call --
    5/7 of the per-call ICI traffic for constant data.  This returns the
    coefficient blocks pre-grown by the H-cell halo along every sharded
    mesh axis (as global sharded arrays whose per-device blocks are the
    haloed blocks); `smooth_level_sharded` then only exchanges the rhs
    (once per call) and the evolving solution (once per kernel chunk).

    Returns None for fully-replicated levels (no sharded axes).
    """
    spec = _level_spec(mesh, coeffs.shape)
    sharded_axes = _sharded_axes_for(mesh, spec)
    if not sharded_axes:
        return None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec,) * 5,
        out_specs=(spec,) * 5,
        check_vma=False,
    )
    def run(invd, e0, e1, e2, band):
        return tuple(
            exchange_halos(a, H, sharded_axes)
            for a in (invd, e0, e1, e2, band)
        )

    return run(
        coeffs.inv_diag, coeffs.ew0, coeffs.ew1, coeffs.ew2,
        coeffs.band.astype(jnp.int8),
    )


def cg_step_sharded(
    z: jax.Array,
    p: jax.Array,
    beta,
    coeffs,
    config,
    mesh,
    interpret: bool = False,
    prehaloed_cg=None,
):
    """Sharded fused CG step: p' = z + beta p, A p', <p', A p'>.

    Per-device: exchange H-deep halos of z and p along the sharded mesh
    axes (the kernel's slab geometry wants an 8-aligned y halo, so the
    full kernel halo is exchanged), run the single-device fused kernel
    (ops.pallas_cg.fused_search_matvec_dot) on the haloed blocks, slice
    the cores back out, and psum the per-device dot partials -- a fixed
    reduction tree, so the dot stays deterministic.

    `prehaloed_cg` optionally carries the four constant operator arrays
    (diag, ew0..2) pre-haloed once per solve (see prehalo_cg_coeffs).
    """
    spec = _level_spec(mesh, z.shape)
    sharded_axes = _sharded_axes_for(mesh, spec)
    core_slices = tuple(
        slice(H, -H) if any(a == axis for a, _, _ in sharded_axes) else slice(None)
        for axis in range(3)
    )
    if prehaloed_cg is None:
        prehaloed_cg = prehalo_cg_coeffs(coeffs, mesh)
    if prehaloed_cg is None:
        # Fully-replicated level: no sharded axes, so "haloed" blocks are
        # just the arrays themselves.
        prehaloed_cg = (coeffs.diag, coeffs.ew0, coeffs.ew1, coeffs.ew2)
    beta_arr = jnp.asarray(beta, dtype=z.dtype)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, PartitionSpec()) + (spec,) * 4,
        out_specs=(spec, spec, PartitionSpec()),
        check_vma=False,
    )
    def run(z_blk, p_blk, beta_s, dgh, e0h, e1h, e2h):
        zh = exchange_halos(z_blk, H, sharded_axes)
        ph = exchange_halos(p_blk, H, sharded_axes)
        from geometricmultigridpressuresolver_tpu.ops import pallas_cg

        pn, ap, dot = pallas_cg.fused_search_matvec_dot(
            zh, ph, beta_s, dgh, e0h, e1h, e2h,
            block_t=config.pallas_block_t, block_y=config.pallas_block_y,
            interpret=interpret,
        )
        dot = jax.lax.psum(
            dot.reshape(()), tuple(name for _, name, _ in sharded_axes)
        )
        return pn[core_slices], ap[core_slices], dot

    return run(z, p, beta_arr, *prehaloed_cg)


def prehalo_cg_coeffs(coeffs, mesh):
    """Pre-halo the CG operator's constant arrays (diag, ew0..2) once per
    solve, as `prehalo_coeffs` does for the smoother's."""
    spec = _level_spec(mesh, coeffs.shape)
    sharded_axes = _sharded_axes_for(mesh, spec)
    if not sharded_axes:
        return None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec,) * 4,
        out_specs=(spec,) * 4,
        check_vma=False,
    )
    def run(dg, e0, e1, e2):
        return tuple(
            exchange_halos(a, H, sharded_axes) for a in (dg, e0, e1, e2)
        )

    return run(coeffs.diag, coeffs.ew0, coeffs.ew1, coeffs.ew2)


def smooth_level_sharded(
    x: jax.Array,
    b: jax.Array,
    coeffs,
    config,
    forward: bool,
    mesh,
    interpret: bool = False,
    prehaloed=None,
    emit_dot: bool = False,
    x_is_zero: bool = False,
    emit_residual: bool = False,
):
    """Drop-in sharded replacement for solver.mg._smooth_level.

    Inputs are global (possibly sharded) arrays; output keeps the input
    partitioning.  Runs one halo exchange per <=H-pass kernel chunk.
    `prehaloed` is the per-solve coefficient-halo cache from
    `prehalo_coeffs`; without it the coefficients are exchanged here
    (correct but 7 exchanged arrays per call instead of 2).

    The round-2 single-device fusions apply blockwise (VERDICT r2 #3):
    `x_is_zero` skips both the x halo exchange AND the kernel's x streaming
    on the first chunk (halos of zero are zero); `emit_residual` rides the
    final chunk and returns the level residual with the smoothed x (same
    ring-budget rule as fused_smooth -- each haloed block IS a
    single-device problem whose shells are the halo); `emit_dot` returns
    <x_out, b> psum-reduced over the sharded axes (a fixed reduction tree:
    in-slab partials in slab order per device, then the deterministic XLA
    collective).
    """
    spec = _level_spec(mesh, x.shape)
    sharded_axes = _sharded_axes_for(mesh, spec)
    core_slices = tuple(
        slice(H, -H) if any(a == axis for a, _, _ in sharded_axes) else slice(None)
        for axis in range(3)
    )
    schedule = pallas_smoother.schedule_for(config, forward)
    if prehaloed is None:
        prehaloed = prehalo_coeffs(coeffs, mesh)
    if prehaloed is None:
        # Fully-replicated level (no sharded axes): halos are no-ops.
        prehaloed = (
            coeffs.inv_diag, coeffs.ew0, coeffs.ew1, coeffs.ew2,
            coeffs.band.astype(jnp.int8),
        )
    axis_names = tuple(name for _, name, _ in sharded_axes)

    out_specs = (spec,)
    if emit_residual:
        out_specs = out_specs + (spec,)
    if emit_dot:
        out_specs = out_specs + (PartitionSpec(),)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec,) * 7,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        check_vma=False,
    )
    def run(x_blk, b_blk, invdh, e0h, e1h, e2h, bandh):
        # The rhs is constant across the whole pass stack: exchange its
        # halo ONCE per smoother call; only the evolving solution
        # re-exchanges between >H-pass chunks.  Coefficients arrive
        # pre-haloed (constant across the whole solve).
        bh = exchange_halos(b_blk, H, sharded_axes)
        xh = x_blk
        starts = list(range(0, len(schedule), H))
        residual = dot = None
        for start in starts:
            chunk = schedule[start : start + H]
            first, last = start == 0, start == starts[-1]
            zero_x = x_is_zero and first
            if zero_x:
                # x == 0 globally: its halo is zero too, so build the
                # haloed block directly -- NO ppermute (and the kernel
                # never streams it; only the shape matters).
                hshape = list(x_blk.shape)
                for a, _, _ in sharded_axes:
                    hshape[a] += 2 * H
                xh = jnp.zeros(tuple(hshape), dtype=x_blk.dtype)
            else:
                xh = exchange_halos(xh, H, sharded_axes)
            out = pallas_smoother.fused_smooth(
                xh, bh, invdh, e0h, e1h, e2h, bandh,
                chunk, config.jacobi_damping,
                block_t=config.pallas_block_t, block_y=config.pallas_block_y,
                interpret=interpret,
                emit_dot=emit_dot and last,
                emit_residual=emit_residual and last,
                zero_x=zero_x,
            )
            if last:
                out = out if isinstance(out, tuple) else (out,)
                xh = out[0][core_slices]
                if emit_residual:
                    residual = out[1][core_slices]
                if emit_dot:
                    dot = jax.lax.psum(out[-1].reshape(()), axis_names)
            else:
                xh = out[core_slices]
        result = (xh,)
        if emit_residual:
            result = result + (residual,)
        if emit_dot:
            result = result + (dot,)
        return result if len(result) > 1 else result[0]

    return run(x, b, *prehaloed)
