"""Fused CG-step kernel (Pallas, TPU): p' = z + beta*p, Ap', <p', Ap'>.

The outer PCG iteration spends ~40% of its non-preconditioner time on
three separate full-grid passes: the search-direction update
p' = z + beta * p, the mat-vec Ap' (reference applyPoissonMatrix,
Source/HDK_GeometricMultigridOperators.h:621-714), and the dot product
<p', Ap'> (h:1020-1085).  This kernel fuses them: one slab pass reads
z, p, diag, ew0..2 once, writes p' and Ap', and accumulates the dot
partials sequentially in SMEM (a fixed reduction order, preserving the
reference's deterministic per-tile partial-sum semantics).

Geometry matches ops.pallas_smoother: full-z slabs over a (T, Y) grid of
output blocks shifted H cells into the array (no solvable cells live in
the outer H shells), double-buffered HBM->VMEM streaming, zero-aliased
output shells.  Fields are zero outside the solvable set and the stencil
produces zeros at non-solvable cells (zero diag and edge weights), so the
unmasked in-kernel dot equals the reference's masked dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geometricmultigridpressuresolver_tpu.ops.pallas_smoother import (
    H,
    _dense_block_list,
    _neighbor_shift,
    plan_tiles,
)


def _neighbor_sum_slab(pp, e0, e1, e2, t: int, y: int):
    """Off-diagonal sum S over the central (t, y, full-z) region of a slab
    with a 1-cell x halo and an H-cell y halo (the shared geometry of the
    CG-step and residual kernels).

    S[i] = e[i] * v[i+1] + e[i-1] * v[i-1] per axis, with cell-shaped
    upper-face weights (ops.stencil.neighbor_sum).
    """
    c = pp[1 : 1 + t, H : H + y, :]
    e2c = e2[1 : 1 + t, H : H + y, :]
    return (
        e0[1 : 1 + t, H : H + y, :] * pp[2 : 2 + t, H : H + y, :]
        + e0[0:t, H : H + y, :] * pp[0:t, H : H + y, :]
        + e1[1 : 1 + t, H : H + y, :] * pp[1 : 1 + t, H + 1 : H + y + 1, :]
        + e1[1 : 1 + t, H - 1 : H + y - 1, :]
        * pp[1 : 1 + t, H - 1 : H + y - 1, :]
        + e2c * _neighbor_shift(c, 2, True)
        + _neighbor_shift(e2c * c, 2, False)
    )


def _make_kernel(t: int, y: int):
    # All six arrays stream in with the same haloed slab: 1-cell halo in x
    # (dim-0 offsets are unconstrained), 8-cell halo in y (sublane-aligned
    # offsets; only 1 cell is consumed).  Blocks come from a compacted
    # active-slab list (ox/oy/n_active in SMEM); dead slabs are skipped
    # outright -- their outputs are zero via the aliased zero inputs, and
    # they contribute zero to the dot.
    sxh, syh = t + 2, y + 2 * H

    def kernel(
        z_hbm, p_hbm, dg_hbm, e0_hbm, e1_hbm, e2_hbm, beta_smem,
        _zin0, _zin1, ox_s, oy_s, na_s,
        pn_hbm, ap_hbm, dot_smem,
        zs, ps, dgs, e0s, e1s, e2s, acc, in_sem, out_sem,
    ):
        idx = pl.program_id(0)
        na = na_s[0]
        cur = jax.lax.rem(idx, jnp.int32(2))
        nxt = jax.lax.rem(idx + jnp.int32(1), jnp.int32(2))

        pairs = (
            (z_hbm, zs), (p_hbm, ps), (dg_hbm, dgs),
            (e0_hbm, e0s), (e1_hbm, e1s), (e2_hbm, e2s),
        )

        def in_copies(k, slot):
            # block_index * static_tile: provably 8-divisible dim-1 offsets.
            ox, oy = ox_s[k] * t, oy_s[k] * y
            return [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(ox + H - 1, sxh), pl.ds(oy, syh), :],
                    vmem.at[slot],
                    in_sem.at[slot, n],
                )
                for n, (hbm, vmem) in enumerate(pairs)
            ]

        def out_copies(k, slot):
            ox, oy = ox_s[k] * t, oy_s[k] * y
            return [
                pltpu.make_async_copy(
                    ps.at[slot, pl.ds(1, t), pl.ds(H, y), :],
                    pn_hbm.at[pl.ds(ox + H, t), pl.ds(oy + H, y), :],
                    out_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    zs.at[slot, pl.ds(1, t), pl.ds(H, y), :],
                    ap_hbm.at[pl.ds(ox + H, t), pl.ds(oy + H, y), :],
                    out_sem.at[slot, 1],
                ),
            ]

        @pl.when(idx == 0)
        def _():
            acc[0, 0] = jnp.float32(0.0)

            @pl.when(na == 0)
            def _():
                dot_smem[0, 0] = jnp.float32(0.0)

            @pl.when(na > 0)
            def _():
                for cp in in_copies(idx, cur):
                    cp.start()

        @pl.when(idx + 1 < na)
        def _():
            # The slot we prefetch into sourced block idx-1's output DMAs.
            @pl.when(idx >= 1)
            def _():
                for cp in out_copies(idx - 1, nxt):
                    cp.wait()

            for cp in in_copies(idx + 1, nxt):
                cp.start()

        @pl.when(idx < na)
        def _():
            for cp in in_copies(idx, cur):
                cp.wait()

            beta = beta_smem[0, 0]
            pp = zs[cur] + beta * ps[cur]  # p' over the haloed slab
            c = pp[1 : 1 + t, H : H + y, :]
            s = _neighbor_sum_slab(pp, e0s[cur], e1s[cur], e2s[cur], t, y)
            ap = dgs[cur][1 : 1 + t, H : H + y, :] * c - s
            acc[0, 0] = acc[0, 0] + jnp.sum(c * ap, dtype=jnp.float32)

            # Reuse the consumed input slabs as output staging.
            ps[cur, pl.ds(1, t), pl.ds(H, y), :] = c
            zs[cur, pl.ds(1, t), pl.ds(H, y), :] = ap
            for cp in out_copies(idx, cur):
                cp.start()

            @pl.when(idx == na - 1)
            def _():
                for cp in out_copies(idx, cur):
                    cp.wait()

                @pl.when(idx >= 1)
                def _():
                    for cp in out_copies(idx - 1, nxt):
                        cp.wait()

                dot_smem[0, 0] = acc[0, 0]

    return kernel


def _make_residual_kernel(t: int, y: int):
    """r = b - A x in one slab pass (reference computePoissonResidual,
    Source/HDK_GeometricMultigridOperators.h:716-732).  Iterates the
    compacted active-slab list; dead slabs have r = 0 via the zero-aliased
    output."""
    sxh, syh = t + 2, y + 2 * H

    def kernel(
        x_hbm, b_hbm, dg_hbm, e0_hbm, e1_hbm, e2_hbm, _zin,
        ox_s, oy_s, na_s,
        r_hbm,
        xsl, bsl, dgs, e0s, e1s, e2s, in_sem, out_sem,
    ):
        idx = pl.program_id(0)
        na = na_s[0]
        cur = jax.lax.rem(idx, jnp.int32(2))
        nxt = jax.lax.rem(idx + jnp.int32(1), jnp.int32(2))

        pairs = (
            (x_hbm, xsl), (b_hbm, bsl), (dg_hbm, dgs),
            (e0_hbm, e0s), (e1_hbm, e1s), (e2_hbm, e2s),
        )

        def in_copies(k, slot):
            ox, oy = ox_s[k] * t, oy_s[k] * y
            return [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(ox + H - 1, sxh), pl.ds(oy, syh), :],
                    vmem.at[slot],
                    in_sem.at[slot, n],
                )
                for n, (hbm, vmem) in enumerate(pairs)
            ]

        def out_copy(k, slot):
            ox, oy = ox_s[k] * t, oy_s[k] * y
            return pltpu.make_async_copy(
                xsl.at[slot, pl.ds(1, t), pl.ds(H, y), :],
                r_hbm.at[pl.ds(ox + H, t), pl.ds(oy + H, y), :],
                out_sem.at[slot],
            )

        @pl.when((idx == 0) & (na > 0))
        def _():
            for cp in in_copies(idx, cur):
                cp.start()

        @pl.when(idx + 1 < na)
        def _():
            @pl.when(idx >= 1)
            def _():
                out_copy(idx - 1, nxt).wait()

            for cp in in_copies(idx + 1, nxt):
                cp.start()

        @pl.when(idx < na)
        def _():
            for cp in in_copies(idx, cur):
                cp.wait()

            xx = xsl[cur]
            c = xx[1 : 1 + t, H : H + y, :]
            s = _neighbor_sum_slab(xx, e0s[cur], e1s[cur], e2s[cur], t, y)
            r = bsl[cur][1 : 1 + t, H : H + y, :] - (
                dgs[cur][1 : 1 + t, H : H + y, :] * c - s
            )

            xsl[cur, pl.ds(1, t), pl.ds(H, y), :] = r
            out_copy(idx, cur).start()

            @pl.when(idx == na - 1)
            def _():
                out_copy(idx, cur).wait()

                @pl.when(idx >= 1)
                def _():
                    out_copy(idx - 1, nxt).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("block_t", "block_y", "interpret", "plan_itemsize"),
)
def fused_residual(
    x: jax.Array,
    b: jax.Array,
    diag: jax.Array,
    ew0: jax.Array,
    ew1: jax.Array,
    ew2: jax.Array,
    block_t: int = 32,
    block_y: int = 48,
    interpret: bool = False,
    blocks: tuple | None = None,
    plan_itemsize: int | None = None,
) -> jax.Array:
    """r = b - A x via one double-buffered slab pass.

    The residual is zero at non-solvable cells automatically (zero diag and
    edge weights with fields zero outside the solvable set), matching
    ops.stencil.residual's masking.  `blocks` is the compacted active-slab
    list (see pallas_smoother.solvable_block_list); `plan_itemsize` is the
    edge-weight itemsize the block list's tiling was planned with (defaults
    to this call's ew dtype) -- callers sharing a list across kernels must
    pass the planning itemsize so tilings agree.
    """
    nx, ny, nz = x.shape
    rx, ry = nx - 2 * H, ny - 2 * H
    if plan_itemsize is None:
        plan_itemsize = ew0.dtype.itemsize
    tb, yb = plan_tiles(x.shape, plan_itemsize, block_t, block_y)
    nb = (rx // tb) * (ry // yb)
    sxh, syh = tb + 2, yb + 2 * H

    if blocks is None:
        ox_l, oy_l, na = _dense_block_list(rx, ry, tb, yb)
    else:
        ox_l, oy_l, na = blocks
        if ox_l.shape != (nb,):
            raise ValueError(
                f"block list built for {ox_l.shape[0]} blocks, kernel has {nb}"
            )
    na = jnp.asarray(na, jnp.int32).reshape(1)

    kernel = _make_residual_kernel(tb, yb)
    fdt = x.dtype
    edt = ew0.dtype
    slab = lambda dt: pltpu.VMEM((2, sxh, syh, nz), dt)  # noqa: E731
    slab_bytes = sxh * syh * nz
    per_cell = 3 * fdt.itemsize + 3 * edt.itemsize
    vmem_bytes = 2 * per_cell * slab_bytes + 8 * 4 * slab_bytes + (4 << 20)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct(x.shape, fdt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            slab(fdt), slab(fdt), slab(fdt), slab(edt), slab(edt), slab(edt),
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(
            # The estimate drives tile CHOICE; the limit passed to Mosaic
            # gets headroom so a near-exact estimate does not fail
            # compilation by a hair.
            vmem_limit_bytes=min(vmem_bytes + (vmem_bytes >> 2), 120 << 20),
        ),
        interpret=interpret,
    )(x, b, diag, ew0, ew1, ew2, jnp.zeros_like(x), ox_l, oy_l, na)


@functools.partial(
    jax.jit,
    static_argnames=("block_t", "block_y", "interpret", "plan_itemsize"),
)
def fused_search_matvec_dot(
    z: jax.Array,
    p: jax.Array,
    beta: jax.Array,
    diag: jax.Array,
    ew0: jax.Array,
    ew1: jax.Array,
    ew2: jax.Array,
    block_t: int = 32,
    block_y: int = 48,
    interpret: bool = False,
    blocks: tuple | None = None,
    plan_itemsize: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (p_new, A @ p_new, <p_new, A @ p_new>) in one fused pass.

    Preconditions as ops.pallas_smoother.eligible: solvable cells confined
    to [H, n-H) in dims 0/1, lane dim a multiple of 128.  `beta` is a
    traced scalar.  `blocks`/`plan_itemsize` as in `fused_residual`; the
    skipped slabs contribute exactly zero to the dot.
    """
    nx, ny, nz = z.shape
    rx, ry = nx - 2 * H, ny - 2 * H
    if plan_itemsize is None:
        plan_itemsize = ew0.dtype.itemsize
    tb, yb = plan_tiles(z.shape, plan_itemsize, block_t, block_y)
    nb = (rx // tb) * (ry // yb)
    sxh, syh = tb + 2, yb + 2 * H

    if blocks is None:
        ox_l, oy_l, na = _dense_block_list(rx, ry, tb, yb)
    else:
        ox_l, oy_l, na = blocks
        if ox_l.shape != (nb,):
            raise ValueError(
                f"block list built for {ox_l.shape[0]} blocks, kernel has {nb}"
            )
    na = jnp.asarray(na, jnp.int32).reshape(1)

    kernel = _make_kernel(tb, yb)
    fdt = z.dtype
    slab = lambda dt: pltpu.VMEM((2, sxh, syh, nz), dt)  # noqa: E731

    beta_arr = jnp.asarray(beta, dtype=fdt).reshape(1, 1)
    zin = jnp.zeros_like(z)
    slab_bytes = sxh * syh * nz
    vmem_bytes = 2 * 6 * 4 * slab_bytes + 6 * 4 * slab_bytes + (4 << 20)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct(z.shape, fdt),
            jax.ShapeDtypeStruct(z.shape, fdt),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6
        + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            slab(fdt), slab(fdt), slab(fdt), slab(fdt), slab(fdt), slab(fdt),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        input_output_aliases={7: 0, 8: 1},  # zero-filled shells
        compiler_params=pltpu.CompilerParams(
            # The estimate drives tile CHOICE; the limit passed to Mosaic
            # gets headroom so a near-exact estimate does not fail
            # compilation by a hair.
            vmem_limit_bytes=min(vmem_bytes + (vmem_bytes >> 2), 120 << 20),
        ),
        interpret=interpret,
    )(z, p, diag, ew0, ew1, ew2, beta_arr, zin, jnp.zeros_like(z),
      ox_l, oy_l, na)
