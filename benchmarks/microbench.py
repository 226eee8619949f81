"""Loop-amortized microbenchmarks of the hot kernels on the current device.

Per-dispatch latency through the remote-compile tunnel is ~30 ms, so every
measurement here jits a `lax.fori_loop` of K applications and divides.

Usage: python benchmarks/microbench.py [N [K]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gmg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from geometricmultigridpressuresolver_tpu.config import SolverConfig
from geometricmultigridpressuresolver_tpu.models import free_surface, sdf
from geometricmultigridpressuresolver_tpu.ops import stencil, transfer
from geometricmultigridpressuresolver_tpu.solver import mg as mg_mod


def timed_loop(name, fn, x0, args, k, bytes_per_iter=None):
    """Time k fused applications of fn(x, *args) and print ms + GB/s."""

    @jax.jit
    def run(x, args):
        def body(_, x):
            return fn(x, *args)

        return jax.lax.fori_loop(0, k, body, x)

    out = jax.block_until_ready(run(x0, args))  # compile + warm
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(x0, args))
    dt = (time.perf_counter() - t0) / k
    bw = f"  {bytes_per_iter / dt / 1e9:8.1f} GB/s" if bytes_per_iter else ""
    print(f"{name:<44} {dt * 1e3:8.3f} ms{bw}", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    config = SolverConfig(solve_dtype=jnp.float32, mg_dtype=jnp.float32)
    print(f"device {jax.devices()[0]}, {n}^3 scene, K={k}", flush=True)

    phi, _ = sdf.splash_scene((n, n, n), xp=jnp)
    weights = sdf.open_box_weights((n, n, n), xp=jnp)
    setup = free_surface.build_setup(phi, weights, config=config)
    hier = setup.problem.hier
    c0 = hier.levels[0]
    shape = c0.shape
    cells = int(np.prod(shape))
    print(f"fine level {shape} = {cells / 1e6:.1f}M cells, {hier.num_levels} levels")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)

    fp = 4
    # Pure program-dispatch overhead: K trivial iterations on a tiny array.
    tiny = jnp.ones((8, 128), dtype=jnp.float32)
    timed_loop("dispatch overhead probe (8,128)",
               lambda t: t + 1.0, tiny, (), k)
    # apply_poisson reads x + diag + 3 ew, writes 1.
    timed_loop("apply_poisson (fine)", stencil.apply_poisson, x, (c0,), k,
               bytes_per_iter=6 * cells * fp)
    # jacobi reads x,b,inv_diag,3 ew (+diag via identity), writes 1.
    timed_loop("jacobi_smooth (fine)",
               lambda x, b, c: stencil.jacobi_smooth(x, b, c), x, (b, c0), k,
               bytes_per_iter=7 * cells * fp)
    timed_loop("boundary_jacobi (fine)",
               lambda x, b, c: stencil.boundary_jacobi(x, b, c), x, (b, c0), k,
               bytes_per_iter=8 * cells * fp)
    timed_loop("rb_gauss_seidel fwd (fine)",
               lambda x, b, c: stencil.rb_gauss_seidel(x, b, c, True), x,
               (b, c0), k, bytes_per_iter=2 * 7 * cells * fp)
    timed_loop("smooth_level block jnp (3B+GS+3B)",
               lambda x, b, c: mg_mod._smooth_level(x, b, c, config, True), x,
               (b, c0), k, bytes_per_iter=8 * 7 * cells * fp)
    timed_loop("residual (fine)",
               lambda x, b, c: stencil.residual(x, b, c), x, (b, c0), k,
               bytes_per_iter=7 * cells * fp)

    # Fused Pallas kernels (TPU only; geometry gates may skip them).
    from geometricmultigridpressuresolver_tpu.ops import pallas_cg
    from geometricmultigridpressuresolver_tpu.ops import pallas_smoother as ps

    if ps.eligible(shape, 0, hier.num_levels, config.pallas_block_t):
        blocks = ps.level_blocks(c0, config)
        band8 = c0.band.astype(jnp.int8)
        sched = ps.schedule_for(config, True)

        def fused_block(x, b, c, band8, blocks):
            return ps.fused_smooth(
                x, b, c.inv_diag, c.ew0, c.ew1, c.ew2, band8, sched,
                config.jacobi_damping, block_t=config.pallas_block_t,
                block_y=config.pallas_block_y, blocks=blocks,
            )

        timed_loop("fused smoother (8 passes, occupancy)", fused_block, x,
                   (b, c0, band8, blocks), k,
                   bytes_per_iter=8 * 7 * cells * fp)

        def fused_down(x, b, c, band8, blocks):
            out, r = ps.fused_smooth(
                x, b, c.inv_diag, c.ew0, c.ew1, c.ew2, band8, sched,
                config.jacobi_damping, block_t=config.pallas_block_t,
                block_y=config.pallas_block_y, blocks=blocks,
                zero_x=True, emit_residual=True,
            )
            return out + 0 * r

        timed_loop("fused smoother zero_x + residual", fused_down, x,
                   (b, c0, band8, blocks), k,
                   bytes_per_iter=9 * 7 * cells * fp)

        def fused_step(x, b, c, blocks):
            pn, ap, _ = pallas_cg.fused_search_matvec_dot(
                x, b, jnp.float32(0.5), c.diag, c.ew0, c.ew1, c.ew2,
                block_t=config.pallas_block_t, block_y=config.pallas_block_y,
                blocks=blocks, plan_itemsize=c.ew0.dtype.itemsize,
            )
            return pn + 0 * ap

        timed_loop("fused CG step (occupancy)", fused_step, x,
                   (b, c0, blocks), k, bytes_per_iter=8 * cells * fp)

        # Outer-CG tail (the XLA-fused trio; the hand-written tail kernel
        # measured slower at 256^3 and 448^3 and was removed in round 5 --
        # benchmarks/RESULTS.md).
        alpha = jnp.float32(0.37)

        def xla_tail(x, p, r, ap, solvable):
            xn = x + alpha * p
            rn = jnp.where(solvable, r - alpha * ap, r)
            rr = jnp.sum(jnp.where(solvable, rn * rn, 0.0), dtype=jnp.float32)
            return xn + 0 * rn + 0 * rr

        timed_loop("XLA update+norm tail (3 fused ops)", xla_tail, x,
                   (b, x, b, c0.solvable), k, bytes_per_iter=7 * cells * fp)

    if hier.num_levels > 1:
        c1 = hier.levels[1]
        # Shapes change across the transfer, so time the round trip.
        timed_loop("restrict+prolong_add round trip",
                   lambda x, s1, s0: transfer.prolong_add(
                       x, transfer.restrict(x, s1), s0),
                   x, (c1.solvable, c0.solvable), k,
                   bytes_per_iter=int(3.3 * cells * fp))

    # Coarse levels on the padded-view kernel vs the jnp block
    # (config.pallas_pad_coarse, docs/DESIGN.md 2d).  The aux entries are
    # (padded coeffs, slab list) -- arrays only, safe to pass through the
    # timing jit (the pad spec is re-derived from static shapes inside).
    flags = mg_mod._pallas_level_flags(hier, config)
    block_lists = (
        mg_mod.hierarchy_block_lists(hier, config)
        if "padded" in flags else None
    )
    for level, flag in enumerate(flags):
        if flag != "padded":
            continue
        cl = hier.levels[level]
        cl_cells = int(np.prod(cl.shape))
        xl = jnp.asarray(rng.standard_normal(cl.shape), dtype=jnp.float32)
        bl = jnp.asarray(rng.standard_normal(cl.shape), dtype=jnp.float32)
        timed_loop(f"L{level} smooth block jnp {cl.shape}",
                   lambda x, b, c: mg_mod._smooth_level(x, b, c, config, True),
                   xl, (bl, cl), k, bytes_per_iter=8 * 7 * cl_cells * fp)
        timed_loop(f"L{level} smooth block padded kernel",
                   lambda x, b, c, a: mg_mod._smooth_level(
                       x, b, c, config, True, use_pallas="padded", blocks=a),
                   xl, (bl, cl, block_lists[level]), k,
                   bytes_per_iter=8 * 7 * cl_cells * fp)

    # The production preconditioner call: x = 0 entry (zero-x fused
    # downstroke path); the carry feeds b so the loop has a data dep.
    timed_loop("full v_cycle (preconditioner, x = 0)",
               lambda b, h: mg_mod.v_cycle(h, jnp.zeros_like(b), b, config),
               b, (hier,), max(3, k // 4))

    # Layout probes: elementwise and stencil cost vs lane-dim alignment.
    for nz in (256, 288, 384):
        arr = jnp.asarray(rng.standard_normal((256, 256, nz)), dtype=jnp.float32)
        cells_p = 256 * 256 * nz
        timed_loop(f"copy+1 (256,256,{nz})", lambda a: a + 1.0, arr, (), k,
                   bytes_per_iter=2 * cells_p * fp)

    def synth_coeffs(shape):
        sv = jnp.ones(shape, dtype=bool)
        one = jnp.ones(shape, dtype=jnp.float32)
        return stencil.LevelCoeffs(
            solvable=sv, band=sv, diag=6.0 * one, inv_diag=one / 6.0,
            ew0=one, ew1=one, ew2=one,
        )

    for shape in ((256, 256, 256), (288, 256, 288), (288, 288, 256),
                  (256, 256, 384)):
        cs = synth_coeffs(shape)
        xs = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
        cells_s = int(np.prod(shape))
        timed_loop(f"apply_poisson {shape}", stencil.apply_poisson, xs, (cs,),
                   k, bytes_per_iter=6 * cells_s * fp)


if __name__ == "__main__":
    main()
