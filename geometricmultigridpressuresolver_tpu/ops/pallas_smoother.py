"""Fused multi-pass smoother kernel (Pallas, TPU).

The V-cycle's per-level smoothing block is
``boundary^k ; interior ; boundary^k`` -- with the reference defaults
(k = 3, red/black Gauss-Seidel interior) that is 8 full-grid stencil passes
(Source/HDK_GeometricMultigridPoissonSolver.cpp:445-513).  Expressed as
separate XLA ops, every pass re-reads the 7 coefficient/state grids from
HBM: ~8x the unavoidable traffic, and measured ~18 ms per block at 256^3 on
a v5e.  This kernel fuses the whole pass stack into ONE Pallas kernel:

  * the grid is cut into (T, Y, full-z) output slabs; each slab is loaded
    once with an H-cell halo in x and y (H = 8 >= number of fused passes),
    all passes run in VMEM, and only the central (T, Y) region is written
    back -- the classic overlapped-halo ("ghost cell") stencil fusion;
  * per-pass update uses the identity (valid because inv_diag * diag = 1 on
    solvable cells and fields are identically zero outside the solvable
    set):  x' = select(mask, (1-w) * x + w * inv_diag * (b + S), x)
    with S the off-diagonal neighbor sum, so the kernel needs only
    x, b, inv_diag, ew0..2 (fp32) and the band mask (int8);
  * checkerboard parity for the Gauss-Seidel half-sweeps is static per
    block because T and Y are even;
  * blocks shifted H cells into the grid: the outer H shells of the array
    hold no solvable cells (the multigrid exterior padding is >= H for the
    levels this kernel accepts -- see `eligible`), and the output's shells
    are zero-filled via an aliased zero input, preserving the "zero outside
    the solvable set" invariant.

HBM traffic per fused block: 6 fp32 grids + 1 int8 in, 1 fp32 out
(~29 B/cell) instead of ~8 x 29 B/cell -- plus halo overlap (~(T+2H)(Y+2H)
/ (T*Y) on the input side).

Falls back to the jnp operators (ops.stencil) off-TPU, in fp64, for
schedules deeper than H, or for levels whose exterior padding is too thin;
`interpret=True` runs the same kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 8  # halo width = max fusable pass-stack depth

# Pass kinds: damped-Jacobi over the boundary band ('b'), undamped
# Gauss-Seidel half-sweeps over the red/black checkerboard ('r'/'k'),
# damped Jacobi over all solvable cells ('j').
_KINDS = ("b", "r", "k", "j")


def schedule_for(config, forward: bool) -> tuple[str, ...]:
    """The reference smoothing block as a pass list.

    Downstroke: boundary^k, red, black, boundary^k; upstroke reverses the
    interior sweep (black, red) -- the adjoint ordering
    (Source/HDK_GeometricMultigridPoissonSolver.cpp:466-479 vs 740-751).
    """
    bnd = ("b",) * config.boundary_iterations
    if config.use_gauss_seidel:
        interior = ("r", "k") if forward else ("k", "r")
    else:
        interior = ("j",)
    return bnd + interior + bnd


def plan_tiles(
    shape, ew_itemsize: int, block_t: int, block_y: int
) -> tuple[int, int]:
    """Resolve the (tb, yb) slab tiling for a level: largest requested tiles
    that divide the interior extents AND fit the smoother's VMEM budget.

    This is the single source of truth for kernel geometry -- the smoother,
    the residual kernel, the CG-step kernel, and the block-occupancy lists
    all derive their tiling from it (the smoother's (t+2H, y+2H) slab is
    strictly the largest, so a tiling that fits it fits the others).
    """
    nx, ny, nz = shape
    rx, ry = nx - 2 * H, ny - 2 * H
    tb = _pick_tile(rx, block_t)
    yb = _pick_tile(ry, block_y)
    while _vmem_estimate(tb + 2 * H, yb + 2 * H, nz, ew_itemsize) > (100 << 20):
        if yb > 8:
            yb = _pick_tile(ry, yb - 8)
        elif tb > 8:
            tb = _pick_tile(rx, tb - 8)
        else:
            break
    return tb, yb


def _compact_blocks(occ: jax.Array, gx: int, gy: int):
    """Order-preserving compaction of a block occupancy mask into (bx, by,
    n_active) padded to the full block count."""
    nb = gx * gy
    n_active = occ.sum(dtype=jnp.int32)
    pos = jnp.where(occ, jnp.cumsum(occ, dtype=jnp.int32) - 1, jnp.int32(nb))
    bi = jnp.arange(nb, dtype=jnp.int32)
    bx = jnp.zeros(nb, jnp.int32).at[pos].set(bi // gy, mode="drop")
    by = jnp.zeros(nb, jnp.int32).at[pos].set(bi % gy, mode="drop")
    return bx, by, n_active


def solvable_block_list(
    solvable: jax.Array, tb: int, yb: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compacted active-slab list for the fused kernels.

    Returns (bx, by, n_active): int32 BLOCK indices of the (tb, yb, full-z)
    output slabs that contain at least one solvable cell, in block-index
    order, padded to the full block count (padding entries are never
    streamed).  Block indices (not cell offsets) so the kernels can form
    offsets as `index * tile` -- Mosaic then proves the sublane-alignment
    of the DMA slices statically.  This is the kernel-level equivalent of
    the reference's constant-tile skip
    (Source/HDK_GeometricMultigridOperators.h:1646-1769 + the
    tile-occupancy checks in every operator loop): slabs with no solvable
    cell produce identically-zero output, so the kernels skip their DMA
    and compute entirely and let the zero-aliased output supply the
    result.
    """
    nx, ny, _ = solvable.shape
    rx, ry = nx - 2 * H, ny - 2 * H
    gx, gy = rx // tb, ry // yb
    core = solvable[H : H + rx, H : H + ry, :]
    occ = core.reshape(gx, tb, gy, yb, -1).any(axis=(1, 3, 4)).reshape(-1)
    return _compact_blocks(occ, gx, gy)


def split_strip_blocks(
    solvable: jax.Array, band: jax.Array, tb: int, yb: int, strip_w: int
):
    """Partition the active slabs by boundary-band geometry:

      (full_list, strip_list) with full ∪ strip = active, disjoint.

    A slab goes on the STRIP list when every band cell of its HALOED
    window lies in the two z-edge strips [0, strip_w) ∪ [nz-strip_w, nz).
    On such slabs the boundary-Jacobi passes can compute ONLY the strips:
    outside the band the pass is the identity (band = 0 gives a = 1,
    wb = 0, x' = 1·x + 0·(b+s) = x exactly), and non-band values are
    therefore invariant across consecutive 'b' passes -- so strip cells
    reading ring neighbors just outside the strip read values that could
    not have changed, and the restricted pass computes the same
    arithmetic in the same association order as the full one (equal to
    FMA-contraction rounding, measured <= 1 ulp).  The z walls put band cells in every liquid column, which
    is why round-3's whole-slab band skip measured zero empty-band slabs;
    the strips are where that band actually lives for slabs away from the
    free surface.
    """
    nx, ny, nz = solvable.shape
    rx, ry = nx - 2 * H, ny - 2 * H
    gx, gy = rx // tb, ry // yb
    sx, sy = tb + 2 * H, yb + 2 * H
    core = solvable[H : H + rx, H : H + ry, :]
    occ = core.reshape(gx, tb, gy, yb, -1).any(axis=(1, 3, 4)).reshape(-1)
    # Band cells in the z-MIDDLE anywhere in a slab's haloed (sx, sy)
    # window disqualify it; windows overlap, so reduce over full columns
    # first, then window-max at the slab stride.
    band_mid = (
        (band[:, :, strip_w : nz - strip_w] != 0).any(axis=2).astype(jnp.int8)
    )
    winbad = (
        jax.lax.reduce_window(
            band_mid, jnp.int8(0), jax.lax.max, (sx, sy), (tb, yb), "valid"
        )
        > 0
    ).reshape(-1)
    return (
        _compact_blocks(occ & winbad, gx, gy),
        _compact_blocks(occ & ~winbad, gx, gy),
    )


def _dense_block_list(rx: int, ry: int, tb: int, yb: int):
    """All-blocks-active list (the no-skip fallback); block indices."""
    gy = ry // yb
    nb = (rx // tb) * gy
    bi = jnp.arange(nb, dtype=jnp.int32)
    return bi // gy, bi % gy, jnp.int32(nb)


def _pick_tile(r: int, t_max: int, quantum: int = 8) -> int:
    """Largest multiple of `quantum` <= max(t_max, quantum) dividing r.

    Requires r to be a positive multiple of `quantum` (the eligibility
    gates guarantee it); raises otherwise rather than returning a bogus
    tile.
    """
    if r < quantum or r % quantum:
        raise ValueError(f"extent {r} is not a positive multiple of {quantum}")
    t = max(min(t_max, r), quantum)
    t -= t % quantum
    while t > quantum and r % t:
        t -= quantum
    return t


def eligible(shape, level: int, num_levels: int, block_t: int = 8) -> bool:
    """Can the fused kernel run on this level?

    Requires the outer H shells of dims 0/1 to hold no solvable cells.  The
    expanded-domain builders guarantee exterior padding 2**(L-1-level) per
    side (ops.domain.expansion_params / compact_expansion_params), so with
    the actual (possibly capped) hierarchy depth as a conservative stand-in
    for L, padding >= H holds iff level <= num_levels - 4.  Shapes must
    tile: dims 0/1 multiples of 8 with at least one interior slab.
    """
    nx, ny, nz = shape
    if 2 ** (num_levels - 1 - level) < H:
        return False
    # The kernel's true tiling quantum is 8 (_pick_tile shrinks block_t/y).
    if (nx - 2 * H) < 8 or (nx - 2 * H) % 8:
        return False
    if (ny - 2 * H) < 8 or (ny - 2 * H) % 8:
        return False
    if nz % 128:  # Mosaic DMA slices must be 128-aligned along lanes
        return False
    # Even minimal (8, 8) slabs must fit the VMEM budget (huge-nz levels
    # fall back to jnp instead of failing Mosaic compilation).
    if _vmem_estimate(8 + 2 * H, 8 + 2 * H, nz, 4) > (100 << 20):
        return False
    return True


def _vmem_estimate(
    sx: int, sy: int, nz: int, ew_itemsize: int, f_itemsize: int = 4
) -> int:
    """Scratch (2 slots x {3 field + 3 ew + int8} slabs) plus headroom for
    Mosaic's compute temporaries (always fp32, even when the field STORAGE
    is bfloat16 -- see _make_kernel's compute_dtype).

    Tiling choices (plan_tiles / eligible) always call this with the fp32
    default f_itemsize=4 so a level's slab geometry is one function of its
    shape -- independent of config.mg_field_dtype -- and block-occupancy
    lists stay valid across field-dtype A/Bs; only the vmem LIMIT handed to
    Mosaic uses the actual itemsize.
    """
    slab = sx * sy * nz
    per_cell = 3 * f_itemsize + 3 * ew_itemsize + 1
    return 2 * per_cell * slab + 8 * 4 * slab + (4 << 20)


def padded_view_spec(shape, level: int, num_levels: int, config):
    """Pad widths ((mx, mx), (my, my), (0, pz)) that make an ineligible
    level eligible for the fused kernel, or None.

    A level misses `eligible` for geometry reasons only: a too-thin
    exterior margin in dims 0/1 (the builders guarantee only
    2**(num_levels-1-level) cells per side), interior extents that are not
    multiples of 8, or a lane extent that is not a multiple of 128.  All
    three are fixable by appending EXTERIOR cells: zero coefficients and a
    zero x/b pad make the padded smoothing arithmetic identical on the
    natural region (every stencil read that crosses the natural boundary
    is multiplied by a zero edge weight), while the padded shape satisfies
    the kernel's tiling.  The reference instead smooths such levels with
    its generic tiled loops (Source/HDK_GeometricMultigridOperators.h:
    476-728); on TPU re-shaping the problem to fit the fast kernel beats
    carrying a second kernel family.

    Returns None when the level is already eligible, too small to pay for
    a kernel launch (config.pallas_pad_min_cells), or when the padded view
    would stream too many dead cells (config.pallas_pad_max_ratio).
    """
    if not config.pallas_pad_coarse:
        return None
    if eligible(shape, level, num_levels, config.pallas_block_t):
        return None
    nx, ny, nz = shape
    cells = nx * ny * nz
    if cells < config.pallas_pad_min_cells:
        return None
    natural = 2 ** (num_levels - 1 - level)

    def _margin(n: int):
        # Smallest per-side margin m with total exterior >= H and interior
        # extent (n + 2m - 2H) a positive multiple of the tiling quantum 8.
        for m in range(max(0, H - natural), max(0, H - natural) + 9):
            if (n + 2 * m - 2 * H) >= 8 and (n + 2 * m - 2 * H) % 8 == 0:
                return m
        return None

    mx, my = _margin(nx), _margin(ny)
    if mx is None or my is None:
        return None
    pz = (-nz) % 128
    padded = (nx + 2 * mx, ny + 2 * my, nz + pz)

    def _physical(s):
        # fp32 arrays are (8, 128)-tiled in HBM: sublane (dim 1) extents
        # round to 8 and lane (dim 2) extents to 128 physically, so pad
        # that stays inside the tail tiles moves zero extra bytes.
        return s[0] * (-(-s[1] // 8) * 8) * (-(-s[2] // 128) * 128)

    if _physical(padded) > config.pallas_pad_max_ratio * _physical(shape):
        return None
    if _vmem_estimate(8 + 2 * H, 8 + 2 * H, padded[2], 4) > (100 << 20):
        return None
    return ((mx, mx), (my, my), (0, pz))


def spec_between(natural, padded):
    """Recover the pad spec from (natural, padded) shapes.

    Inverse of padded_view_spec's construction (symmetric margins in dims
    0/1, trailing-only lane pad) -- lets consumers carry only the padded
    coefficient arrays across jit boundaries and re-derive the spec from
    static shapes instead of shipping Python ints that would trace into
    tracers.
    """
    (nx, ny, nz), (px, py, pz) = natural, padded
    assert (px - nx) % 2 == 0 and (py - ny) % 2 == 0 and pz >= nz, (
        natural, padded,
    )
    return ((px - nx) // 2, (px - nx) // 2), ((py - ny) // 2, (py - ny) // 2), (0, pz - nz)


def pad_coeffs(coeffs, spec):
    """Zero-padded copy of a LevelCoeffs per `spec` (from padded_view_spec).

    Pad cells are EXTERIOR by construction: not solvable, not band, zero
    diag/inv_diag/edge weights -- the padded operator restricted to the
    natural region IS the natural operator.
    """
    return coeffs._replace(
        solvable=jnp.pad(coeffs.solvable, spec),
        band=jnp.pad(coeffs.band, spec),
        diag=jnp.pad(coeffs.diag, spec),
        inv_diag=jnp.pad(coeffs.inv_diag, spec),
        ew0=jnp.pad(coeffs.ew0, spec),
        ew1=jnp.pad(coeffs.ew1, spec),
        ew2=jnp.pad(coeffs.ew2, spec),
    )


def _neighbor_shift(x, axis: int, up: bool):
    """Zero-filled unit shift along `axis` (block edges read zeros; the
    resulting 1-cell-per-pass garbage ring is inside the halo budget)."""
    n = x.shape[axis]
    zeros_shape = list(x.shape)
    zeros_shape[axis] = 1
    z = jnp.zeros(zeros_shape, dtype=x.dtype)
    sl = [slice(None)] * x.ndim
    if up:  # out[i] = x[i+1]
        sl[axis] = slice(1, n)
        return jnp.concatenate([x[tuple(sl)], z], axis=axis)
    sl[axis] = slice(0, n - 1)  # out[i] = x[i-1]
    return jnp.concatenate([z, x[tuple(sl)]], axis=axis)


def _make_kernel(schedule: tuple[str, ...], damping: float, t: int, y: int,
                 emit_dot: bool, emit_residual: bool = False,
                 zero_x: bool = False, compute_dtype=None,
                 band_strip: int = 0):
    """Kernel factory; all geometry is static.

    1-D grid with two slab slots: while active block k is computed, block
    k+1's input slabs stream in (double buffering) -- the kernel is
    DMA-bound, so the overlap hides most of the compute.  The grid covers
    the FULL block count, but programs only touch the first n_active
    entries of the compacted (ox, oy) list; trailing programs are empty
    (dead slabs cost neither DMA nor compute -- the zero-aliased output
    already holds their all-zero result).

    `emit_residual` additionally computes r = b - A x_out over the central
    region after the final pass (the slab already holds every input the
    residual needs) and streams it as a second output -- fusing the
    downstroke's smooth->residual pair into one HBM round trip.
    `zero_x` statically specializes for x == 0 (every V-cycle downstroke
    entry): the x slab is never streamed in.
    """
    assert len(schedule) <= H and all(k in _KINDS for k in schedule)
    w = damping
    sx, sy = t + 2 * H, y + 2 * H

    def kernel(*args):
        (x_hbm, b_hbm, id_hbm, e0_hbm, e1_hbm, e2_hbm, band_hbm, _zin_hbm,
         *rest) = args
        if emit_residual:
            _rzin_hbm, ox_s, oy_s, na_s, out_hbm, r_hbm, *tail = rest
        else:
            ox_s, oy_s, na_s, out_hbm, *tail = rest
            r_hbm = None
        if emit_dot:
            dot_smem, xs, bs, ids, e0s, e1s, e2s, bands, in_sem, out_sem, acc = tail
        else:
            xs, bs, ids, e0s, e1s, e2s, bands, in_sem, out_sem = tail
        idx = pl.program_id(0)
        na = na_s[0]
        cur = jax.lax.rem(idx, jnp.int32(2))
        nxt = jax.lax.rem(idx + jnp.int32(1), jnp.int32(2))

        hbms = (x_hbm, b_hbm, id_hbm, e0_hbm, e1_hbm, e2_hbm, band_hbm)
        slabs = (xs, bs, ids, e0s, e1s, e2s, bands)
        if zero_x:
            hbms, slabs = hbms[1:], slabs[1:]

        def in_copies(k, slot):
            # Offsets formed as block_index * static_tile so Mosaic can
            # prove the 8-divisibility of the dim-1 (sublane) DMA offset.
            ox, oy = ox_s[k] * t, oy_s[k] * y
            return [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(ox, sx), pl.ds(oy, sy), :],
                    vmem.at[slot],
                    in_sem.at[slot, n],
                )
                for n, (hbm, vmem) in enumerate(zip(hbms, slabs))
            ]

        def out_copies(k, slot):
            ox, oy = ox_s[k] * t, oy_s[k] * y
            copies = [
                pltpu.make_async_copy(
                    xs.at[slot, pl.ds(H, t), pl.ds(H, y), :],
                    out_hbm.at[pl.ds(ox + H, t), pl.ds(oy + H, y), :],
                    out_sem.at[slot, 0],
                )
            ]
            if emit_residual:
                # The residual stages through the consumed b slab.
                copies.append(
                    pltpu.make_async_copy(
                        bs.at[slot, pl.ds(H, t), pl.ds(H, y), :],
                        r_hbm.at[pl.ds(ox + H, t), pl.ds(oy + H, y), :],
                        out_sem.at[slot, 1],
                    )
                )
            return copies

        @pl.when(idx == 0)
        def _():
            if emit_dot:
                acc[0, 0] = jnp.float32(0.0)

                # With no active blocks the final-program branch below never
                # fires; the dot output must still be defined.
                @pl.when(na == 0)
                def _():
                    dot_smem[0, 0] = jnp.float32(0.0)

            @pl.when(na > 0)
            def _():
                for cp in in_copies(idx, cur):
                    cp.start()

        @pl.when(idx + 1 < na)
        def _():
            # The slot we prefetch into sourced block idx-1's output DMAs;
            # its staging slabs must be fully drained before overwriting.
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

            # Fields may be STORED narrower than they are computed
            # (config.mg_field_dtype=bfloat16 halves the x/b/inv_diag DMA
            # traffic); the upcasts below happen on VMEM-resident slabs --
            # registers, not HBM.
            cdt_np = jnp.dtype(compute_dtype or bs.dtype)
            if zero_x:
                x = jnp.zeros((sx, sy) + bs.shape[3:], dtype=cdt_np)
            else:
                x = xs[cur].astype(cdt_np)
            b = bs[cur].astype(cdt_np)
            invd = ids[cur].astype(cdt_np)
            e0, e1, e2 = e0s[cur], e1s[cur], e2s[cur]
            # int8 vector compares are unsupported on TPU; blend
            # arithmetically.
            band_f = bands[cur].astype(cdt_np)

            # Checkerboard parity: global parity == local parity because
            # the slab origin (ox, oy, 0) has even coordinate sum (t, y
            # even).
            ii = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
            kk = jax.lax.broadcasted_iota(jnp.int32, b.shape, 2)
            red = ((ii + jj + kk) % 2) == 0

            dt = b.dtype.type

            def neighbor_sum(v):
                s = e0 * _neighbor_shift(v, 0, True) + _neighbor_shift(e0 * v, 0, False)
                s += e1 * _neighbor_shift(v, 1, True) + _neighbor_shift(e1 * v, 1, False)
                s += e2 * _neighbor_shift(v, 2, True) + _neighbor_shift(e2 * v, 2, False)
                return s

            # Pass-invariant coefficient products, hoisted out of the pass
            # loop: the boundary pass
            #   x + band * ((1-w) x + w invd (b+s) - x)
            # is algebraically (1 - w band) x + (w band invd) (b+s), so
            # with a := 1 - w band and wb := w band invd computed ONCE per
            # slab each 'b' pass costs 2 mul + 2 add per cell instead of
            # 4 mul + 4 add -- the select is gone and the damping multiply
            # is pre-folded.  Same identity check as before: band = 0
            # (incl. every non-solvable cell) gives a = 1, wb = 0, x' = x.
            if "b" in schedule:
                wb = dt(w) * band_f * invd
                a = dt(1.0) - dt(w) * band_f
            if "j" in schedule:
                wid = dt(w) * invd

            def b_strip_pass(x):
                # Boundary pass restricted to the two z-edge strips (this
                # kernel instance only runs on slabs whose band lies
                # entirely there -- split_strip_blocks): outside the band
                # the pass is exactly the identity, so skipping the
                # middle's neighbor sums changes nothing (same arithmetic,
                # same association order; only compiler FMA contraction
                # may differ, <= 1 ulp).  The z-NEIGHBOR term is computed
                # on full lanes -- it needs a one-lane ring, and ring
                # slices (129 lanes) break Mosaic's aligned vector layout
                # -- while the x/y terms and the update run on the
                # lane-aligned strips only: a 'b' pass drops from ~12 to
                # ~4 + 12·(2·strip/nz) mul-adds per cell.
                nzs = x.shape[2]
                zterm = e2 * _neighbor_shift(x, 2, True) + _neighbor_shift(
                    e2 * x, 2, False
                )

                def region(z0, z1):
                    zc = (slice(None), slice(None), slice(z0, z1))
                    xr = x[zc]
                    e0r, e1r = e0[zc], e1[zc]
                    # Same association order as neighbor_sum ((e0 terms +
                    # e1 terms) + e2 terms), so the strip result matches
                    # the full pass to FMA-contraction rounding.
                    s = e0r * _neighbor_shift(xr, 0, True) + _neighbor_shift(
                        e0r * xr, 0, False
                    )
                    s += e1r * _neighbor_shift(xr, 1, True) + _neighbor_shift(
                        e1r * xr, 1, False
                    )
                    s += zterm[zc]
                    return a[zc] * xr + wb[zc] * (b[zc] + s)

                return jnp.concatenate(
                    [
                        region(0, band_strip),
                        x[:, :, band_strip : nzs - band_strip],
                        region(nzs - band_strip, nzs),
                    ],
                    axis=2,
                )

            for kind in schedule:
                if kind == "b" and band_strip:
                    x = b_strip_pass(x)
                    continue
                s = neighbor_sum(x)
                if kind == "j":
                    x = dt(1 - w) * x + wid * (b + s)
                elif kind == "b":
                    x = a * x + wb * (b + s)
                else:  # 'r' / 'k': undamped GS half-sweep on one color
                    upd = invd * (b + s)
                    mask = red if kind == "r" else jnp.logical_not(red)
                    x = jnp.where(mask, upd, x)

            if emit_dot:
                # <x_out, b> partials over the central region, accumulated
                # in a fixed (sequential) order: fuses the CG rho = <r, z>
                # reduction into the preconditioner's final smoother pass
                # (z := x_out, r := this level's rhs).  Dead slabs
                # contribute exactly zero, so skipping them keeps the dot
                # equal to the reference's masked reduction.
                acc[0, 0] = acc[0, 0] + jnp.sum(
                    x[H : H + t, H : H + y, :] * b[H : H + t, H : H + y, :],
                    dtype=jnp.float32,
                )

            if emit_residual:
                # r = b - (diag x - S) with diag recovered from inv_diag
                # (exact reciprocal pair on solvable cells; 0 elsewhere so
                # non-solvable cells stay masked to r = 0 via b = 0, x = 0).
                diag = jnp.where(invd != 0, dt(1.0) / invd, dt(0.0))
                r = b + neighbor_sum(x) - diag * x
                bs[cur] = r.astype(bs.dtype)

            xs[cur] = x.astype(xs.dtype)
            for cp in out_copies(idx, cur):
                cp.start()

            @pl.when(idx == na - 1)
            def _():
                for cp in out_copies(idx, cur):
                    cp.wait()
                # Drain the previous block's outputs too (their wait
                # normally happens in the NEXT step's prefetch, which
                # won't run).
                @pl.when(idx >= 1)
                def _():
                    for cp in out_copies(idx - 1, nxt):
                        cp.wait()

                if emit_dot:
                    dot_smem[0, 0] = acc[0, 0]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "schedule", "damping", "block_t", "block_y", "interpret", "emit_dot",
        "emit_residual", "zero_x", "band_strip",
    ),
)
def fused_smooth(
    x: jax.Array,
    b: jax.Array,
    inv_diag: jax.Array,
    ew0: jax.Array,
    ew1: jax.Array,
    ew2: jax.Array,
    band_i8: jax.Array,
    schedule: tuple[str, ...],
    damping: float = 2.0 / 3.0,
    block_t: int = 8,
    block_y: int = 64,
    interpret: bool = False,
    emit_dot: bool = False,
    emit_residual: bool = False,
    zero_x: bool = False,
    blocks: tuple[jax.Array, jax.Array, jax.Array] | None = None,
    strip_blocks: tuple[jax.Array, jax.Array, jax.Array] | None = None,
    band_strip: int = 0,
):
    """Apply the fused pass stack; returns the updated solution grid (and,
    with `emit_dot`, the scalar <x_out, b> -- the CG rho when this is the
    preconditioner's final fine-level pass; with `emit_residual`, the
    residual r = b - A x_out as a second grid).

    `strip_blocks` + `band_strip` enable the band-strip specialization:
    `blocks` and `strip_blocks` must PARTITION the active slabs
    (split_strip_blocks); the strip slabs run a kernel whose boundary
    passes compute only the two `band_strip`-lane z-edge strips --
    identical arithmetic (the pass is the exact identity off the band;
    only FMA contraction may differ) at a fraction of the VPU work.  Two kernel launches chain through an
    aliased output, so each active slab is written exactly once.

    `zero_x` statically specializes for x == 0 (the V-cycle downstroke
    entry): the x slab is never streamed from HBM, and -- because the
    first pass then consumes no neighbor ring -- the slab stays valid one
    ring wider, which is exactly what makes `emit_residual` exact for a
    full H-pass schedule.  Ring budget: a k-pass chunk starting from
    streamed x is valid on the central region when k <= H, on central+1
    when k <= H-1; starting from x == 0 it is valid on central+1 when
    k <= H.  The residual's neighbor sum needs central+1.

    `blocks` is an optional compacted active-slab list from
    `solvable_block_list(solvable, *plan_tiles(...))`; slabs not on the
    list are skipped entirely (no DMA, no compute -- their output is zero
    by the aliasing invariant).  Without it, every slab runs.

    Preconditions (checked by `eligible`): dims 0/1 tile into (block_t, Y)
    slabs after removing the H-cell shells, no solvable cells in those
    shells, len(schedule) <= H.
    """
    if emit_residual and not (zero_x or len(schedule) <= H - 1):
        raise ValueError(
            "emit_residual needs one spare halo ring: requires zero_x or "
            f"a schedule of <= {H - 1} passes (got {len(schedule)})"
        )
    nx, ny, nz = x.shape
    rx, ry = nx - 2 * H, ny - 2 * H
    fdt = x.dtype
    assert b.dtype == fdt and inv_diag.dtype == fdt, (
        "x/b/inv_diag must share one storage dtype", x.dtype, b.dtype,
        inv_diag.dtype,
    )
    edt = ew0.dtype  # possibly narrower (config.mg_ew_dtype)
    # Narrow STORAGE (config.mg_field_dtype=bfloat16) still computes in
    # fp32: the upcast happens on VMEM slabs after the (halved) DMA.
    cdt = jnp.float32 if fdt == jnp.bfloat16 else None
    tb, yb = plan_tiles(x.shape, edt.itemsize, block_t, block_y)
    gx, gy = rx // tb, ry // yb
    nb = gx * gy
    sx, sy = tb + 2 * H, yb + 2 * H

    if blocks is None:
        ox_l, oy_l, na = _dense_block_list(rx, ry, tb, yb)
    else:
        ox_l, oy_l, na = blocks
        if ox_l.shape != (nb,):
            raise ValueError(
                f"block list built for {ox_l.shape[0]} blocks, kernel has {nb}"
            )

    slab = lambda dt: pltpu.VMEM((2, sx, sy, nz), dt)  # noqa: E731
    vmem_bytes = _vmem_estimate(sx, sy, nz, edt.itemsize, fdt.itemsize)

    def _launch(strip_w, block_list, x_init, r_init):
        kernel = _make_kernel(
            schedule, damping, tb, yb, emit_dot, emit_residual, zero_x,
            compute_dtype=cdt, band_strip=strip_w,
        )
        bx, by, n_act = block_list
        n_act = jnp.asarray(n_act, jnp.int32).reshape(1)
        out_shape = [jax.ShapeDtypeStruct(x.shape, fdt)]
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        operands = [x, b, inv_diag, ew0, ew1, ew2, band_i8, x_init]
        aliases = {7: 0}  # zero-filled shells / prior launch's slabs
        if emit_residual:
            operands.append(r_init)
            aliases[8] = 1
            out_shape.append(jax.ShapeDtypeStruct(x.shape, fdt))
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch = [
            slab(fdt), slab(fdt), slab(fdt), slab(edt), slab(edt), slab(edt),
            pltpu.VMEM((2, sx, sy, nz), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 7)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        if emit_dot:
            out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            scratch = scratch + [pltpu.SMEM((1, 1), jnp.float32)]

        n_any = len(operands)
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_any
            + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
            scratch_shapes=scratch,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                # The estimate drives tile CHOICE; the limit passed to
                # Mosaic gets headroom so a near-exact estimate does not
                # fail compilation by a hair.
                vmem_limit_bytes=min(
                    vmem_bytes + (vmem_bytes >> 2), 120 << 20
                ),
            ),
            interpret=interpret,
        )(*operands, bx, by, n_act)

    use_strip = (
        strip_blocks is not None and band_strip and "b" in schedule
    )
    zin = jnp.zeros_like(x)
    rzin = jnp.zeros_like(x) if emit_residual else None
    out = _launch(0, (ox_l, oy_l, na), zin, rzin)
    if not use_strip:
        return out
    # Second launch over the strip slabs, chained through the first
    # launch's outputs (disjoint slab sets; each active slab written once).
    out = out if isinstance(out, tuple) else (out,)
    x1 = out[0]
    r1 = out[1] if emit_residual else None
    out2 = _launch(band_strip, strip_blocks, x1, r1)
    if not (emit_dot or emit_residual):
        return out2
    out2 = out2 if isinstance(out2, tuple) else (out2,)
    if emit_dot:
        # Per-launch dot partials cover disjoint slabs; the rho is the sum.
        return out2[:-1] + (out[-1] + out2[-1],)
    return out2


def level_blocks(coeffs, config):
    """The level's compacted active-slab list under `config`'s tiling.

    Derived from the solvable mask each call; inside a jitted CG loop XLA's
    loop-invariant code motion hoists it (the mask is loop-invariant), so
    the per-iteration cost is nil.
    """
    tb, yb = plan_tiles(
        coeffs.solvable.shape, coeffs.ew0.dtype.itemsize,
        config.pallas_block_t, config.pallas_block_y,
    )
    return solvable_block_list(coeffs.solvable, tb, yb)


def residual_fusable(config, forward: bool = True) -> bool:
    """Can `emit_residual` ride the final chunk of this schedule (given a
    zero initial x)?  True unless the last chunk is a full H passes AND is
    not the first chunk (so the zero-x spare ring is already spent)."""
    n = len(schedule_for(config, forward))
    last = n % H or H
    return last <= H - 1 or n <= H


def smooth_level_pallas(
    x, b, coeffs, config, forward: bool, interpret=False, emit_dot=False,
    blocks=None, x_is_zero=False, emit_residual=False,
):
    """Drop-in replacement for solver.mg._smooth_level via fused kernels.

    Splits the schedule into <= H-pass chunks (one kernel launch each; the
    default 3/GS/3 block is exactly 8 passes = one launch).  With
    `emit_dot`, also returns <x_out, b> from the final chunk.  With
    `x_is_zero` (caller guarantees x == 0, the V-cycle downstroke entry)
    the first chunk never streams x; with `emit_residual` the final chunk
    also returns r = b - A x_out (requires the spare halo ring --
    x_is_zero for single-chunk schedules; see fused_smooth).
    """
    schedule = schedule_for(config, forward)
    band_i8 = coeffs.band.astype(jnp.int8)
    # Narrow-field mode (config.mg_field_dtype): x/b arrive in the field
    # dtype; stream inv_diag at the same width.  The astype is
    # solve-invariant, so XLA's LICM hoists it out of the CG loop -- one
    # conversion per solve, halved DMA every smoother call.
    inv_diag = coeffs.inv_diag
    if inv_diag.dtype != x.dtype:
        inv_diag = inv_diag.astype(x.dtype)
    if blocks is None:
        blocks = level_blocks(coeffs, config)
    # Band-strip specialization (config.pallas_band_strip): partition the
    # active slabs so boundary passes on band-in-z-strips slabs compute
    # only the strips.  The split is solve-invariant (mask + band), so
    # XLA's LICM hoists it out of the CG loop like the block list itself.
    strip_w = int(config.pallas_band_strip or 0)
    strip_split = None
    if strip_w and coeffs.shape[2] >= 3 * strip_w and "b" in schedule:
        tb, yb = plan_tiles(
            coeffs.shape, coeffs.ew0.dtype.itemsize,
            config.pallas_block_t, config.pallas_block_y,
        )
        strip_split = split_strip_blocks(
            coeffs.solvable, coeffs.band, tb, yb, strip_w
        )
    starts = list(range(0, len(schedule), H))
    dot = residual = None
    for start in starts:
        chunk = schedule[start : start + H]
        first, last = start == 0, start == starts[-1]
        if strip_split is not None and "b" in chunk:
            chunk_blocks, chunk_strip, chunk_w = (
                strip_split[0], strip_split[1], strip_w
            )
        else:
            chunk_blocks, chunk_strip, chunk_w = blocks, None, 0
        out = fused_smooth(
            x, b, inv_diag, coeffs.ew0, coeffs.ew1, coeffs.ew2,
            band_i8, chunk, config.jacobi_damping,
            block_t=config.pallas_block_t, block_y=config.pallas_block_y,
            interpret=interpret, emit_dot=emit_dot and last,
            emit_residual=emit_residual and last,
            zero_x=x_is_zero and first, blocks=chunk_blocks,
            strip_blocks=chunk_strip, band_strip=chunk_w,
        )
        if last:
            out = out if isinstance(out, tuple) else (out,)
            x = out[0]
            if emit_residual:
                residual = out[1]
            if emit_dot:
                dot = out[-1]
        else:
            x = out
    result = (x,)
    if emit_residual:
        result = result + (residual,)
    if emit_dot:
        result = result + (dot.reshape(()),)
    return result if len(result) > 1 else x
