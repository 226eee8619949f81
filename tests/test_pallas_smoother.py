"""Fused Pallas smoother vs the jnp reference operators (interpret mode).

The kernel must be pass-for-pass equivalent to the jnp smoothing block
(solver.mg._smooth_level): same schedule, same masks, same damping.  On CPU
the kernel runs under the Pallas interpreter; on TPU the same code compiles
via Mosaic (exercised by bench.py / the A/B harness in benchmarks/).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from geometricmultigridpressuresolver_tpu.config import SolverConfig
from geometricmultigridpressuresolver_tpu.ops import pallas_smoother
from geometricmultigridpressuresolver_tpu.solver import mg as mg_mod
from tests import helpers


@pytest.fixture(scope="module")
def fixture32():
    labels, weights, mg_levels = helpers.expanded_domain(
        helpers.sine_dirichlet_domain, 32, fractional=True
    )
    config = SolverConfig(solve_dtype=jnp.float32)
    hier = mg_mod.build_hierarchy(labels, weights, mg_levels, config)
    c = hier.levels[0]
    rng = np.random.default_rng(7)
    x = jnp.where(
        c.solvable, jnp.asarray(rng.standard_normal(c.shape), dtype=jnp.float32), 0.0
    )
    b = jnp.where(
        c.solvable, jnp.asarray(rng.standard_normal(c.shape), dtype=jnp.float32), 0.0
    )
    return hier, c, x, b


@pytest.mark.parametrize("forward", [True, False])
@pytest.mark.parametrize("use_gs", [True, False])
def test_fused_block_matches_jnp(fixture32, forward, use_gs):
    hier, c, x, b = fixture32
    config = SolverConfig(solve_dtype=jnp.float32, use_gauss_seidel=use_gs)
    ref = mg_mod._smooth_level(x, b, c, config, forward=forward)
    got = pallas_smoother.smooth_level_pallas(
        x, b, c, config, forward=forward, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_fused_block_chunking(fixture32):
    """Schedules deeper than the halo split into multiple kernel launches."""
    hier, c, x, b = fixture32
    config = SolverConfig(solve_dtype=jnp.float32, boundary_iterations=4)
    assert len(pallas_smoother.schedule_for(config, True)) == 10  # 4+2+4
    ref = mg_mod._smooth_level(x, b, c, config, forward=True)
    got = pallas_smoother.smooth_level_pallas(
        x, b, c, config, forward=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_eligibility_rules():
    # level too coarse (padding 2**(nlev-1-level) < H)
    assert not pallas_smoother.eligible((64, 64, 128), level=1, num_levels=4)
    assert pallas_smoother.eligible((64, 64, 128), level=0, num_levels=4)
    # lane dim must be a multiple of 128
    assert not pallas_smoother.eligible((64, 64, 64), level=0, num_levels=4)
    # dims 0/1 must tile into slabs
    assert not pallas_smoother.eligible((20, 64, 128), level=0, num_levels=4)


def test_zero_outside_solvable_preserved(fixture32):
    hier, c, x, b = fixture32
    config = SolverConfig(solve_dtype=jnp.float32)
    got = pallas_smoother.smooth_level_pallas(
        x, b, c, config, forward=True, interpret=True
    )
    out = np.asarray(got)
    assert (out[~np.asarray(c.solvable)] == 0).all()


def test_fused_cg_step_matches_jnp(fixture32):
    """ops.pallas_cg: p' = z + beta p, A p', <p', A p'> in one pass."""
    from geometricmultigridpressuresolver_tpu.ops import blas, pallas_cg, stencil

    hier, c, x, b = fixture32
    z, p = x, b
    beta = jnp.float32(0.7371)
    p_ref = z + beta * p
    ap_ref = jnp.where(c.solvable, stencil.apply_poisson(p_ref, c), 0.0)
    pap_ref = float(blas.dot(p_ref, ap_ref, c.solvable))

    pn, ap, pap = pallas_cg.fused_search_matvec_dot(
        z, p, beta, c.diag, c.ew0, c.ew1, c.ew2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(pn), np.asarray(p_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap_ref), atol=2e-5)
    np.testing.assert_allclose(float(pap[0, 0]), pap_ref, rtol=1e-5)


def test_emit_dot_matches_blas(fixture32):
    """The smoother's fused <x_out, b> equals the separate reduction."""
    from geometricmultigridpressuresolver_tpu.ops import blas

    hier, c, x, b = fixture32
    config = SolverConfig(solve_dtype=jnp.float32)
    x1, dot = pallas_smoother.smooth_level_pallas(
        x, b, c, config, forward=True, interpret=True, emit_dot=True
    )
    x2 = pallas_smoother.smooth_level_pallas(
        x, b, c, config, forward=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)
    ref = float(blas.dot(x2, b, c.solvable))
    np.testing.assert_allclose(float(dot), ref, rtol=1e-5)


def test_fused_residual_matches_jnp(fixture32):
    """ops.pallas_cg.fused_residual: r = b - A x in one slab pass."""
    from geometricmultigridpressuresolver_tpu.ops import pallas_cg, stencil

    hier, c, x, b = fixture32
    ref = stencil.residual(x, b, c)
    got = pallas_cg.fused_residual(
        x, b, c.diag, c.ew0, c.ew1, c.ew2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_block_occupancy_skipping(fixture32):
    """Dead (no-solvable) slabs are skipped exactly: the compacted-list
    kernels agree with the dense-list kernels and the jnp operators.

    The sine-Dirichlet domain leaves whole x-slabs without solvable cells,
    so the compacted list is genuinely shorter than the block count."""
    from geometricmultigridpressuresolver_tpu.ops import blas, pallas_cg, stencil

    hier, c, x, b = fixture32
    config = SolverConfig(solve_dtype=jnp.float32)
    tb, yb = pallas_smoother.plan_tiles(
        c.shape, c.ew0.dtype.itemsize,
        config.pallas_block_t, config.pallas_block_y,
    )
    ox, oy, na = pallas_smoother.solvable_block_list(c.solvable, tb, yb)
    nb = ox.shape[0]
    assert int(na) < nb, "fixture should contain dead slabs"
    assert int(na) > 0

    # Every solvable cell is covered by a listed slab.
    H = pallas_smoother.H
    covered = np.zeros(c.shape, dtype=bool)
    for k in range(int(na)):
        o_x, o_y = int(ox[k]) * tb, int(oy[k]) * yb
        covered[H + o_x : H + o_x + tb, H + o_y : H + o_y + yb, :] = True
    assert (covered | ~np.asarray(c.solvable)).all()

    blocks = (ox, oy, na)
    # Smoother: compacted == dense == jnp.
    ref = mg_mod._smooth_level(x, b, c, config, forward=True)
    got = pallas_smoother.smooth_level_pallas(
        x, b, c, config, forward=True, interpret=True, blocks=blocks
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    # Residual kernel with the same list.
    r_ref = stencil.residual(x, b, c)
    r_got = pallas_cg.fused_residual(
        x, b, c.diag, c.ew0, c.ew1, c.ew2, interpret=True, blocks=blocks,
        block_t=tb, block_y=yb, plan_itemsize=c.ew0.dtype.itemsize,
    )
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_ref), atol=2e-5)

    # CG-step kernel: outputs and the dot (dead slabs contribute zero).
    beta = jnp.float32(0.31)
    p_ref = x + beta * b
    ap_ref = jnp.where(c.solvable, stencil.apply_poisson(p_ref, c), 0.0)
    pap_ref = float(blas.dot(p_ref, ap_ref, c.solvable))
    pn, ap, pap = pallas_cg.fused_search_matvec_dot(
        x, b, beta, c.diag, c.ew0, c.ew1, c.ew2, interpret=True, blocks=blocks,
        block_t=tb, block_y=yb, plan_itemsize=c.ew0.dtype.itemsize,
    )
    np.testing.assert_allclose(np.asarray(pn), np.asarray(p_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap_ref), atol=2e-5)
    np.testing.assert_allclose(float(pap[0, 0]), pap_ref, rtol=1e-5)


def test_zero_x_and_fused_residual(fixture32):
    """Downstroke specialization: with x == 0 the kernel skips streaming x,
    and the final pass can emit r = b - A x_out exactly (the zero start
    leaves one spare halo ring -- fused_smooth's ring-budget rule)."""
    from geometricmultigridpressuresolver_tpu.ops import stencil

    hier, c, x, b = fixture32
    config = SolverConfig(solve_dtype=jnp.float32)
    zero = jnp.zeros_like(b)

    ref = mg_mod._smooth_level(zero, b, c, config, forward=True)
    r_ref = stencil.residual(ref, b, c)

    got, r_got = pallas_smoother.smooth_level_pallas(
        zero, b, c, config, forward=True, interpret=True,
        x_is_zero=True, emit_residual=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_ref), atol=2e-4)

    # All three outputs together (residual + rho fusion).
    got2, r2, dot = pallas_smoother.smooth_level_pallas(
        zero, b, c, config, forward=True, interpret=True,
        x_is_zero=True, emit_residual=True, emit_dot=True,
    )
    from geometricmultigridpressuresolver_tpu.ops import blas

    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r_ref), atol=2e-4)
    np.testing.assert_allclose(
        float(dot), float(blas.dot(ref, b, c.solvable)), rtol=1e-5
    )

    # The ring-budget guard: an 8-pass schedule without the zero-x spare
    # ring must be rejected.
    with np.testing.assert_raises(ValueError):
        pallas_smoother.fused_smooth(
            x, b, c.inv_diag, c.ew0, c.ew1, c.ew2,
            c.band.astype(jnp.int8),
            ("b",) * 8, interpret=True, emit_residual=True, zero_x=False,
        )


@pytest.mark.slow
def test_full_fused_solve_matches_jnp_interpret():
    """End-to-end MGPCG with EVERY single-device fusion engaged (fused
    smoother, zero-x residual, CG-step, rho dot)
    in interpret mode vs the jnp path: same iterations, same solution.

    Uses the 64^3 splash window (lane-aligned to 128) so `eligible` is
    genuinely true -- the same geometry the kernels need on real chips.
    """
    from geometricmultigridpressuresolver_tpu.models import free_surface, sdf
    from geometricmultigridpressuresolver_tpu.solver import mgpcg

    n = 64
    phi, velocity = sdf.splash_scene((n, n, n))
    weights = sdf.open_box_weights((n, n, n))
    base_kwargs = dict(
        solve_dtype=jnp.float32, mg_dtype=jnp.float32,
        tolerance=1e-4, max_iterations=8, coarse_dof_target=1,
    )
    cfg_jnp = SolverConfig(kernel_mode="jnp", **base_kwargs)
    cfg_pal = SolverConfig(
        kernel_mode="pallas", pallas_interpret=True, record_residuals=True,
        **base_kwargs,
    )

    setup = free_surface.build_setup(phi, weights, config=cfg_jnp)
    flags = mg_mod._pallas_level_flags(setup.problem.hier, cfg_pal)
    assert flags[0] is True, f"fused path must engage: {flags}"

    velocity = tuple(jnp.asarray(v, jnp.float32) for v in velocity)
    base = free_surface.project(setup, velocity, config=cfg_jnp)
    fused = free_surface.project(setup, velocity, config=cfg_pal)

    assert int(fused.cg.iterations) == int(base.cg.iterations)
    scale = float(jnp.max(jnp.abs(base.pressure))) or 1.0
    diff = float(jnp.max(jnp.abs(fused.pressure - base.pressure))) / scale
    assert diff < 1e-4, diff
    # The recorded history ends at the exit scalar.
    hist = np.asarray(fused.cg.residual_history)
    assert hist[int(fused.cg.iterations)] == pytest.approx(
        float(fused.cg.relative_residual), rel=1e-5
    )


def test_residual_fusable_rule():
    cfg = SolverConfig()  # 3 + GS(2) + 3 = 8 passes, single chunk
    assert pallas_smoother.residual_fusable(cfg)
    cfg4 = SolverConfig(boundary_iterations=4)  # 10 passes -> [8, 2]
    assert pallas_smoother.residual_fusable(cfg4)
    cfg7 = SolverConfig(boundary_iterations=7)  # 16 passes -> [8, 8]
    assert not pallas_smoother.residual_fusable(cfg7)


def test_padded_view_spec_rules():
    # pallas_pad_coarse defaults OFF (measured regression at 128^3, see
    # config.py); the spec rules are exercised with the mechanism enabled.
    cfg = SolverConfig(pallas_pad_coarse=True)
    # The 256^3 splash hierarchy's L2 (72, 64, 128): misses eligibility
    # only on the exterior margin (2**(5-1-2) = 4 < H = 8); a 4-cell pad
    # per side in x/y fixes it at ratio 1.25.
    assert not pallas_smoother.eligible((72, 64, 128), level=2, num_levels=5)
    spec = pallas_smoother.padded_view_spec((72, 64, 128), 2, 5, cfg)
    assert spec == ((4, 4), (4, 4), (0, 0))
    # Already-eligible levels return None (no pad needed).
    assert pallas_smoother.padded_view_spec((288, 256, 384), 0, 5, cfg) is None
    # Too small to pay for a kernel launch (the min-cells guard).
    assert pallas_smoother.padded_view_spec((36, 32, 64), 3, 5, cfg) is None
    # Lane padding is PHYSICALLY free ((8,128) HBM tiling): z 192 -> 256
    # stays inside tail tiles the layout allocates anyway, so the ratio
    # guard (which compares physical footprints) accepts this by default.
    spec2 = pallas_smoother.padded_view_spec((72, 64, 192), 2, 5, cfg)
    assert spec2 == ((4, 4), (4, 4), (0, 64))
    # Margins in dims 0/1 DO move real bytes: a thin level whose margins
    # nearly double the physical footprint is rejected by the ratio guard
    # (min-cells relaxed so the ratio guard is what fires) ...
    tight = SolverConfig(pallas_pad_coarse=True, pallas_pad_min_cells=0)
    assert pallas_smoother.padded_view_spec((24, 24, 512), 1, 2, tight) is None
    # ... and accepted once the ratio allows it.
    loose = SolverConfig(
        pallas_pad_coarse=True, pallas_pad_min_cells=0, pallas_pad_max_ratio=3.0
    )
    spec3 = pallas_smoother.padded_view_spec((24, 24, 512), 1, 2, loose)
    assert spec3 == ((8, 8), (8, 8), (0, 0))
    # The knob turns the whole mechanism off.
    off = SolverConfig(pallas_pad_coarse=False)
    assert pallas_smoother.padded_view_spec((72, 64, 128), 2, 5, off) is None


@pytest.fixture(scope="module")
def padded_level_fixture(fixture32):
    """A coarse level of the 32^3 hierarchy forced onto the padded path."""
    hier, _, _, _ = fixture32
    level = 1
    c = hier.levels[level]
    cfg = SolverConfig(
        solve_dtype=jnp.float32, pallas_pad_coarse=True,
        pallas_pad_min_cells=0, pallas_pad_max_ratio=1e9,
    )
    spec = pallas_smoother.padded_view_spec(
        c.shape, level, hier.num_levels, cfg
    )
    assert spec is not None, (c.shape, hier.num_levels)
    pc = pallas_smoother.pad_coeffs(c, spec)
    assert pallas_smoother.spec_between(c.shape, pc.shape) == spec
    blocks = (pc, pallas_smoother.level_blocks(pc, cfg))
    rng = np.random.default_rng(11)
    x = jnp.where(
        c.solvable, jnp.asarray(rng.standard_normal(c.shape), jnp.float32), 0.0
    )
    b = jnp.where(
        c.solvable, jnp.asarray(rng.standard_normal(c.shape), jnp.float32), 0.0
    )
    return c, cfg, blocks, x, b


@pytest.mark.parametrize("forward", [True, False])
def test_padded_smooth_matches_jnp(padded_level_fixture, forward):
    """Smoothing on the zero-padded exterior view is the natural smoothing:
    every stencil read crossing the natural boundary carries a zero edge
    weight, so the pad cells never contribute."""
    c, cfg_pad, blocks, x, b = padded_level_fixture
    cfg = SolverConfig(solve_dtype=jnp.float32, pallas_interpret=True)
    ref = mg_mod._smooth_level(x, b, c, cfg, forward=forward)
    got = mg_mod._smooth_level(
        x, b, c, cfg, forward=forward, use_pallas="padded", blocks=blocks
    )
    assert got.shape == c.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
    # Pad cells of the padded view are not solvable.
    assert not bool(blocks[0].solvable[0, 0, 0])


def test_padded_smooth_zero_x_residual_dot(padded_level_fixture):
    """The downstroke fusions (zero-x streaming skip, in-slab residual,
    rho dot) all ride the padded view, outputs sliced back to the natural
    window."""
    from geometricmultigridpressuresolver_tpu.ops import blas, stencil

    c, _, blocks, _, b = padded_level_fixture
    cfg = SolverConfig(solve_dtype=jnp.float32, pallas_interpret=True)
    zero = jnp.zeros_like(b)
    ref = mg_mod._smooth_level(zero, b, c, cfg, forward=True)
    r_ref = stencil.residual(ref, b, c)
    got, r_got, dot = mg_mod._smooth_level(
        zero, b, c, cfg, forward=True, use_pallas="padded", blocks=blocks,
        x_is_zero=True, emit_residual=True, emit_dot=True,
    )
    assert got.shape == c.shape and r_got.shape == c.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_ref), atol=2e-4)
    np.testing.assert_allclose(
        float(dot), float(blas.dot(ref, b, c.solvable)), rtol=1e-5
    )


def test_padded_flags_and_vcycle(fixture32):
    """_pallas_level_flags reports "padded" for pad-eligible levels and the
    whole V-cycle matches the jnp path with those levels engaged."""
    hier, _, x, b = fixture32
    cfg_jnp = SolverConfig(solve_dtype=jnp.float32, kernel_mode="jnp")
    cfg_pad = SolverConfig(
        solve_dtype=jnp.float32, kernel_mode="pallas", pallas_interpret=True,
        pallas_pad_coarse=True, pallas_pad_min_cells=0,
        pallas_pad_max_ratio=1e9,
    )
    flags = mg_mod._pallas_level_flags(hier, cfg_pad)
    assert "padded" in flags, flags
    # Default config: pallas_pad_coarse is OFF (measured regression at
    # 128^3, see config.py) -- no level takes the padded view.
    flags_default = mg_mod._pallas_level_flags(
        hier, SolverConfig(solve_dtype=jnp.float32, kernel_mode="pallas")
    )
    assert "padded" not in flags_default, flags_default
    # With the mechanism enabled but default guards, the fine level (262k
    # cells, physically-free lane pad 64 -> 128) qualifies, but every
    # coarse level of this 32^3 hierarchy is below pallas_pad_min_cells
    # and stays on the jnp path.
    flags_guarded = mg_mod._pallas_level_flags(
        hier,
        SolverConfig(
            solve_dtype=jnp.float32, kernel_mode="pallas",
            pallas_pad_coarse=True,
        ),
    )
    assert "padded" not in flags_guarded[1:], flags_guarded
    # The knob disables the mechanism outright.
    flags_off = mg_mod._pallas_level_flags(
        hier,
        SolverConfig(
            solve_dtype=jnp.float32, kernel_mode="pallas",
            pallas_pad_coarse=False,
        ),
    )
    assert "padded" not in flags_off, flags_off

    ref = mg_mod.v_cycle(hier, jnp.zeros_like(b), b, cfg_jnp)
    got = mg_mod.v_cycle(hier, jnp.zeros_like(b), b, cfg_pad)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    diff = float(jnp.max(jnp.abs(got - ref))) / scale
    assert diff < 2e-5, diff


def test_bf16_field_storage_close_to_fp32(fixture32):
    """config.mg_field_dtype: bf16-stored x/b stream at half width while the
    kernel computes fp32 on the VMEM slabs -- output equals the fp32 kernel
    to bf16 rounding (the 8-pass block amplifies the per-pass quantization
    by only a small factor)."""
    hier, c, x, b = fixture32
    config = SolverConfig(solve_dtype=jnp.float32)
    ref = pallas_smoother.smooth_level_pallas(
        x, b, c, config, forward=True, interpret=True
    )
    got = pallas_smoother.smooth_level_pallas(
        x.astype(jnp.bfloat16), b.astype(jnp.bfloat16), c, config,
        forward=True, interpret=True,
    )
    assert got.dtype == jnp.bfloat16  # storage stays narrow between passes
    scale = float(jnp.max(jnp.abs(ref)))
    diff = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))) / scale
    assert diff < 0.03, diff
    # The zero-outside-solvable invariant survives the narrow storage.
    out = np.asarray(got.astype(jnp.float32))
    assert (out[~np.asarray(c.solvable)] == 0).all()


def test_bf16_vcycle_output_contract_and_accuracy(fixture32):
    """A V-cycle with mg_field_dtype=bfloat16 returns the mg dtype (the CG
    consumer contract) and stays within bf16 rounding of the jnp cycle;
    the downstroke fused smooth->residual and the upstroke dot fusion all
    ride the narrow storage."""
    hier, c, x, b = fixture32
    cfg_ref = SolverConfig(solve_dtype=jnp.float32, kernel_mode="jnp")
    cfg_bf16 = SolverConfig(
        solve_dtype=jnp.float32, kernel_mode="pallas", pallas_interpret=True,
        mg_field_dtype=jnp.bfloat16,
    )
    ref = mg_mod.v_cycle(hier, jnp.zeros_like(b), b, cfg_ref)
    got, rho = mg_mod.v_cycle(
        hier, jnp.zeros_like(b), b, cfg_bf16, emit_fine_dot=True
    )
    assert got.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(ref)))
    diff = float(jnp.max(jnp.abs(got - ref))) / scale
    assert diff < 0.05, diff
    from geometricmultigridpressuresolver_tpu.ops import blas

    rho_ref = float(blas.dot(ref, b, c.solvable))
    np.testing.assert_allclose(float(rho), rho_ref, rtol=0.05)


def test_band_strip_bit_identical_and_engages():
    """config.pallas_band_strip: slabs whose boundary band lies in the two
    z-edge strips run 'b' passes computing ONLY the strips.  Off the band
    the pass is the exact identity (band=0 -> a=1, wb=0), so the strip
    kernel must match the full kernel to FMA-contraction rounding (same
    arithmetic, same association order) -- and the split must
    actually engage (nonempty strip list) on a compact-window-style domain
    whose interior slabs see band only near the z ends.

    Domain geometry mimics the PRODUCTION compact windows (lane extent a
    minimal 128-multiple, so the trailing exterior pad is < 128 and the
    liquid's top-z wall band lands inside the top lane tile -- see
    RESULTS.md round-5): a pool with walls on five sides and a Dirichlet
    free surface in y, wide enough in x/y that interior slabs' haloed
    windows clear the x walls, the bottom, and the surface rows."""
    from geometricmultigridpressuresolver_tpu.ops import domain as domain_ops

    labels = np.full((128, 160, 384), helpers.EXT, dtype=np.int8)
    labels[16:112, 16:100, 16:368] = helpers.INT   # liquid pool
    labels[16:112, 100:112, 16:368] = helpers.DIR  # air above (free surface)
    weights = helpers.unit_weights(labels)
    labels = domain_ops.set_boundary_labels(labels, weights)
    # 16-row y tiles: this scaled-down pool's band-free y gap (between the
    # bottom band and the surface band) is ~75 rows; haloed slab windows
    # must fit inside it (production-size pools fit the default 48).
    config = SolverConfig(solve_dtype=jnp.float32, pallas_block_y=16)
    hier = mg_mod.build_hierarchy(labels, weights, 6, config)
    c = hier.levels[0]
    assert c.shape[2] >= 3 * 128, c.shape  # strip mode applicable

    tb, yb = pallas_smoother.plan_tiles(
        c.shape, c.ew0.dtype.itemsize, config.pallas_block_t,
        config.pallas_block_y,
    )
    full_l, strip_l = pallas_smoother.split_strip_blocks(
        c.solvable, c.band, tb, yb, 128
    )
    n_full, n_strip = int(full_l[2]), int(strip_l[2])
    assert n_strip > 0, "strip specialization never engaged"
    # Partition: together they cover exactly the active slabs.
    combined = pallas_smoother.solvable_block_list(c.solvable, tb, yb)
    assert n_full + n_strip == int(combined[2])

    rng = np.random.default_rng(61)
    x = jnp.where(
        c.solvable, jnp.asarray(rng.standard_normal(c.shape), jnp.float32),
        0.0,
    )
    b = jnp.where(
        c.solvable, jnp.asarray(rng.standard_normal(c.shape), jnp.float32),
        0.0,
    )
    cfg_strip = SolverConfig(
        solve_dtype=jnp.float32, pallas_block_y=16, pallas_band_strip=128
    )
    # Identical arithmetic in identical association order; the only
    # remaining divergence is compiler FMA contraction (measured <= 1 ulp
    # at band cells, propagated by the GS passes), so the tolerance is a
    # few fp32 ulps -- NOT a stencil-difference tolerance.
    for forward in (True, False):
        ref = pallas_smoother.smooth_level_pallas(
            x, b, c, config, forward=forward, interpret=True
        )
        got = pallas_smoother.smooth_level_pallas(
            x, b, c, cfg_strip, forward=forward, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=5e-6
        )

    # The fused downstroke pair (zero-x + residual + dot) too -- the
    # production V-cycle configuration.
    ref = pallas_smoother.smooth_level_pallas(
        jnp.zeros_like(b), b, c, config, forward=True, interpret=True,
        x_is_zero=True, emit_residual=True, emit_dot=True,
    )
    got = pallas_smoother.smooth_level_pallas(
        jnp.zeros_like(b), b, c, cfg_strip, forward=True, interpret=True,
        x_is_zero=True, emit_residual=True, emit_dot=True,
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=0, atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=0, atol=5e-5
    )
    np.testing.assert_allclose(float(got[2]), float(ref[2]), rtol=1e-6)
