"""Diagnostic suite: the reference test node as a library + CLI.

Equivalent of `HDK_TestGeometricMultigrid`
(Source/HDK_TestGeometricMultigrid.{h,cpp}): two synthetic domain
generators, a delta-spike RHS fixture, and four test blocks dispatched by
toggles (TestGeometricMultigrid.h:10-35).  Each block is a plain function
returning measured numbers; the CLI mirrors the node's parameter sheet
(gridSize, toggles, tolerance, iteration counts) and prints the same style
of fixed-precision report (cpp:642).

Run: ``python -m geometricmultigridpressuresolver_tpu.diagnostics --help``.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from geometricmultigridpressuresolver_tpu.config import SolverConfig
from geometricmultigridpressuresolver_tpu.grids import CellLabel, face_shape
from geometricmultigridpressuresolver_tpu.models import assembled
from geometricmultigridpressuresolver_tpu.ops import blas, domain, stencil
from geometricmultigridpressuresolver_tpu.solver import cg as cg_mod
from geometricmultigridpressuresolver_tpu.solver import mg as mg_mod
from geometricmultigridpressuresolver_tpu.solver import mgpcg

EXT, DIR, INT, BND = (
    int(CellLabel.EXTERIOR),
    int(CellLabel.DIRICHLET),
    int(CellLabel.INTERIOR),
    int(CellLabel.BOUNDARY),
)


# ---------------------------------------------------------------------------
# Domain fixtures
# ---------------------------------------------------------------------------


def build_simple_domain(grid_size: int, dirichlet_band: int = 1) -> np.ndarray:
    """Cube of INTERIOR wrapped in a `dirichlet_band`-cell Dirichlet shell.

    Reference buildSimpleDomain
    (Source/HDK_TestGeometricMultigrid.cpp:466-625).
    """
    labels = np.full((grid_size,) * 3, DIR, dtype=np.int8)
    b = dirichlet_band
    labels[b:-b, b:-b, b:-b] = INT
    return labels


def build_complex_domain(
    grid_size: int,
    use_solid_sphere: bool = False,
    sphere_radius: float = 0.125,
    theta_clamp: float = 0.01,
    weight_clamp: float = 0.01,
    samples: int = 3,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Sine-wave implicit Dirichlet surface, optional solid sphere with true
    cut-cell face weights, domain-edge faces zeroed, ghost-fluid theta
    division on Dirichlet faces.

    Reference buildComplexDomain
    (Source/HDK_TestGeometricMultigrid.cpp:233-461): the implicit surface is
    ``phi(x,y,z) = x - .5 + .25*sin(2*pi*y + 4*pi*z)`` (cpp:233-235), cells
    with phi <= 0 are fluid (INTERIOR) and the rest Dirichlet; the optional
    solid sphere (center .5^3, radius .125, cpp:266) produces supersampled
    cut-cell weights (computeSDFWeightsFace, cpp:266-343, small weights
    clamped to 0 at cpp:321); domain-edge faces are zeroed (cpp:345-360);
    INTERIOR-DIRICHLET face weights are divided by the clamped ghost-fluid
    theta of the implicit surface (cpp:406-461).

    Returns (labels, face_weights) on the base grid.
    """
    n = grid_size
    shape = (n, n, n)
    dx = 1.0 / n

    def surface_phi(x, y, z):
        return x - 0.5 + 0.25 * np.sin(2.0 * np.pi * y + 4.0 * np.pi * z)

    centers = [(np.arange(n) + 0.5) * dx] * 3
    cx, cy, cz = np.meshgrid(*centers, indexing="ij")
    phi = surface_phi(cx, cy, cz)

    def solid_phi(x, y, z):
        # Negative inside the solid (sphere), matching an SDF convention
        # where the cut-cell weight is the fraction of the face OUTSIDE.
        return np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) - sphere_radius

    labels = np.where(phi <= 0, INT, DIR).astype(np.int8)
    if use_solid_sphere:
        # Cells fully inside the solid are EXTERIOR (no DOF, no Dirichlet).
        inside = solid_phi(cx, cy, cz) <= 0
        labels = np.where(inside & (labels == INT), EXT, labels).astype(np.int8)

    weights = []
    offs = (np.arange(samples) + 0.5) / samples
    for axis in range(3):
        fshape = face_shape(shape, axis)
        w = np.ones(fshape, dtype=np.float64)
        if use_solid_sphere:
            w = np.zeros(fshape, dtype=np.float64)
            tangent = [a for a in range(3) if a != axis]
            base = [np.arange(fshape[a]) * dx for a in range(3)]
            for o1 in offs:
                for o2 in offs:
                    shift = [0.0, 0.0, 0.0]
                    # Faces sit at integer coordinates along `axis` and are
                    # sampled across their tangent plane.
                    shift[tangent[0]] = float(o1) * dx
                    shift[tangent[1]] = float(o2) * dx
                    gx, gy, gz = np.meshgrid(
                        base[0] + shift[0],
                        base[1] + shift[1],
                        base[2] + shift[2],
                        indexing="ij",
                    )
                    w += (solid_phi(gx, gy, gz) > 0).astype(np.float64)
            w /= samples * samples
            w[w < weight_clamp] = 0.0

        # Domain-edge faces are closed (reference cpp:345-360).
        edge = [slice(None)] * 3
        edge[axis] = 0
        w[tuple(edge)] = 0.0
        edge[axis] = -1
        w[tuple(edge)] = 0.0

        # Ghost-fluid theta division on INTERIOR-DIRICHLET faces
        # (reference cpp:406-461): theta from the implicit surface values at
        # the two adjacent cell centers, clamped below at `theta_clamp`.
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        la, lb = labels[tuple(lo)], labels[tuple(hi)]
        pa, pb = phi[tuple(lo)], phi[tuple(hi)]
        mixed = ((la == INT) & (lb == DIR)) | ((la == DIR) & (lb == INT))
        inside = np.minimum(pa, pb)
        outside = np.maximum(pa, pb)
        denom = np.where(outside > inside, outside - inside, 1.0)
        theta = np.clip(np.where(mixed, -inside / denom, 1.0), theta_clamp, 1.0)
        interior = [slice(None)] * 3
        interior[axis] = slice(1, -1)
        w[tuple(interior)] = np.where(
            mixed, w[tuple(interior)] / theta, w[tuple(interior)]
        )
        weights.append(w)

    # A cell every incident face of which is closed cannot carry a DOF.
    open_face = np.zeros(shape, dtype=bool)
    for axis in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        open_face |= (weights[axis][tuple(lo)] > 0) | (weights[axis][tuple(hi)] > 0)
    labels = np.where((labels == INT) & ~open_face, EXT, labels).astype(np.int8)
    # Zero any face touching a non-solvable/non-Dirichlet cell.
    for axis in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        interior = [slice(None)] * 3
        interior[axis] = slice(1, -1)
        ext_adj = (labels[tuple(lo)] == EXT) | (labels[tuple(hi)] == EXT)
        w = weights[axis]
        w[tuple(interior)] = np.where(ext_adj, 0.0, w[tuple(interior)])
    return labels, weights


def expand(labels, weights=None):
    """Expanded power-of-two domain + BOUNDARY relabeling (+ weights).

    The shared setup step of every test block
    (Source/HDK_TestGeometricMultigrid.cpp:637-672).
    """
    expanded, offset, mg_levels = domain.expand_domain(labels)
    exp_weights = None
    if weights is not None:
        exp_weights = domain.expand_face_weights(weights, expanded.shape, offset)
    relabeled = domain.set_boundary_labels(expanded, exp_weights)
    return relabeled, exp_weights, offset, mg_levels


def delta_spike_rhs(
    shape,
    amplitude: float = 1000.0,
    solvable=None,
    offset=(0, 0, 0),
    base_shape=None,
) -> np.ndarray:
    """3^3 delta spike of `amplitude` at 10% of the BASE grid.

    Reference RHS fixture (Source/HDK_TestGeometricMultigrid.cpp:727-742):
    the spike position is relative to the test grid; `offset` shifts it
    into the expanded domain (otherwise 10% of an expanded grid can land in
    the exterior padding, silently zeroing the RHS).
    """
    base_shape = base_shape or shape
    rhs = np.zeros(shape, dtype=np.float64)
    c = [max(1, b // 10) + o for b, o in zip(base_shape, offset)]
    rhs[c[0] : c[0] + 3, c[1] : c[1] + 3, c[2] : c[2] + 3] = amplitude
    if solvable is not None:
        rhs[~np.asarray(solvable)] = 0.0
        if not rhs.any():
            raise ValueError(
                "delta spike fell entirely outside the solvable set"
            )
    return rhs


def random_initial_guess(labels, seed: int = 0) -> np.ndarray:
    """Uniform-random initial guess over solvable cells (cpp:683-720)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, size=labels.shape)
    x[np.asarray(labels) < INT] = 0.0
    return x


# ---------------------------------------------------------------------------
# Test blocks
# ---------------------------------------------------------------------------


def run_conjugate_gradient_test(
    grid_size: int = 64,
    use_complex_domain: bool = True,
    use_solid_sphere: bool = True,
    use_mg_preconditioner: bool = True,
    use_random_guess: bool = False,
    tolerance: float = 1e-5,
    max_iterations: int = 1000,
    solve_dtype=None,
    dx: float | None = None,
) -> dict:
    """Full MGPCG (or diag-PCG) vs a scipy-assembled CG oracle on the same
    labels.  Reference testConjugateGradient
    (Source/HDK_TestGeometricMultigrid.cpp:675-1165); scipy replaces Eigen.

    `dx` exercises the dimensionless-operator convention a physical caller
    must use (reference cpp:792-794, 1003-1009): the physical RHS is scaled
    by dx^2 going into the solver, and the reported L-inf residual is
    scaled back by 1/dx^2 on the way out.  The RELATIVE residual and the
    solution agreement are invariant to this scaling -- that invariance IS
    the round trip being demonstrated.  None (default) solves the
    dimensionless system directly (dx = 1).

    Returns relative-L2/L-inf residuals of both solves and their agreement.
    """
    import jax.numpy as jnp

    if use_complex_domain:
        base, weights = build_complex_domain(grid_size, use_solid_sphere)
    else:
        base, weights = build_simple_domain(grid_size), None
    labels, exp_weights, offset, mg_levels = expand(base, weights)

    config = SolverConfig(
        tolerance=tolerance,
        max_iterations=max_iterations,
        use_mg_preconditioner=use_mg_preconditioner,
        **({"solve_dtype": solve_dtype} if solve_dtype is not None else {}),
    )
    problem = mgpcg.build_problem(labels, exp_weights, mg_levels, config)
    solvable = np.asarray(problem.fine.solvable)

    rhs_physical = delta_spike_rhs(
        labels.shape, solvable=solvable, offset=offset, base_shape=base.shape
    )
    dx2 = 1.0 if dx is None else float(dx) ** 2
    # RHS scaled by dx^2 going in (reference cpp:792-794).
    rhs = rhs_physical * dx2
    x0 = random_initial_guess(labels, seed=3) if use_random_guess else None

    t0 = time.time()
    result = mgpcg.solve(
        problem,
        jnp.asarray(rhs),
        x0=None if x0 is None else jnp.asarray(x0),
        config=config,
    )
    grid_x = np.asarray(result.x)
    grid_time = time.time() - t0

    rel, linf = (
        float(v)
        for v in cg_mod.recomputed_residual_norms(
            lambda v: stencil.apply_poisson(v, problem.fine),
            jnp.asarray(grid_x),
            jnp.asarray(rhs, dtype=grid_x.dtype),
            problem.fine.solvable,
        )
    )
    # L-inf residual reported in PHYSICAL units: scaled back by 1/dx^2
    # (reference cpp:1003-1009).  The relative norm cancels the scaling.
    linf /= dx2

    t0 = time.time()
    oracle_x = assembled.solve_assembled(
        labels, rhs, exp_weights, tol=tolerance, x0_grid=x0
    )
    oracle_time = time.time() - t0

    denom = max(float(np.abs(oracle_x[solvable]).max()), 1e-300)
    agreement = float(np.abs((grid_x - oracle_x)[solvable]).max()) / denom
    return {
        "iterations": int(result.iterations),
        "relative_l2": rel,
        "l_infinity": linf,
        "grid_seconds": grid_time,
        "oracle_seconds": oracle_time,
        "max_relative_difference_vs_oracle": agreement,
        "dofs": int(solvable.sum()),
    }


def run_symmetry_test(
    grid_size: int = 32,
    use_complex_domain: bool = True,
    use_solid_sphere: bool = True,
    seed: int = 0,
) -> dict:
    """<M a, b> vs <M b, a> for the six operators of the reference's
    testSymmetry (Source/HDK_TestGeometricMultigrid.cpp:1167-1876).

    Returns the relative asymmetry per operator (all must be < 1e-10).
    """
    import jax
    import jax.numpy as jnp

    if use_complex_domain:
        base, weights = build_complex_domain(grid_size, use_solid_sphere)
    else:
        base, weights = build_simple_domain(grid_size), None
    labels, exp_weights, _, mg_levels = expand(base, weights)

    config_gs = SolverConfig(use_gauss_seidel=True)
    config_j = SolverConfig(use_gauss_seidel=False)
    hier = mg_mod.build_hierarchy(labels, exp_weights, mg_levels, config_gs)
    c0 = hier.levels[0]
    solvable = c0.solvable

    rng = np.random.default_rng(seed)
    a = jnp.where(solvable, jnp.asarray(rng.standard_normal(labels.shape)), 0.0)
    b = jnp.where(solvable, jnp.asarray(rng.standard_normal(labels.shape)), 0.0)

    from geometricmultigridpressuresolver_tpu.ops import transfer

    def smoother_block(rhs):
        return mg_mod._smooth_level(jnp.zeros_like(rhs), rhs, c0, config_j, True)

    def gs_schedule(rhs):
        x = jnp.zeros_like(rhs)
        for _ in range(2):
            x = stencil.rb_gauss_seidel(x, rhs, c0, forward=True)
            x = stencil.rb_gauss_seidel(x, rhs, c0, forward=False)
        return x

    def restrict_prolong(rhs):
        down = transfer.restrict(rhs, hier.levels[1].solvable)
        return transfer.prolong_add(jnp.zeros_like(rhs), down, solvable)

    def vcycle_gs(rhs):
        x = mg_mod.v_cycle(hier, jnp.zeros_like(rhs), rhs, config_gs)
        for _ in range(3):
            x = mg_mod.v_cycle(hier, x, rhs, config_gs, use_initial_guess=True)
        return x

    def vcycle_jacobi(rhs):
        x = mg_mod.v_cycle(hier, jnp.zeros_like(rhs), rhs, config_j)
        for _ in range(3):
            x = mg_mod.v_cycle(hier, x, rhs, config_j, use_initial_guess=True)
        return x

    def coarse_direct(rhs):
        down = rhs
        for level in range(1, hier.num_levels):
            down = transfer.restrict(down, hier.levels[level].solvable)
        up = mg_mod.coarse_solve(hier, down)
        for level in range(hier.num_levels - 2, -1, -1):
            up = transfer.prolong_add(
                jnp.zeros(hier.levels[level].shape, dtype=up.dtype),
                up,
                hier.levels[level].solvable,
            )
        return up

    ops = {
        "boundary+jacobi+boundary smoother": smoother_block,
        "symmetric GS schedule x4": gs_schedule,
        "restriction o prolongation": restrict_prolong,
        "coarse direct solve (via transfers)": coarse_direct,
        "full V-cycle x4 (Gauss-Seidel)": vcycle_gs,
        "full V-cycle x4 (Jacobi)": vcycle_jacobi,
    }
    out = {}
    for name, op in ops.items():
        jop = jax.jit(op)
        dot_a = float(blas.dot(jop(a), b, solvable))
        dot_b = float(blas.dot(jop(b), a, solvable))
        out[name] = abs(dot_a - dot_b) / max(abs(dot_a), abs(dot_b), 1e-300)
    return out


def run_one_level_vcycle_test(
    grid_size: int = 64,
    num_cycles: int = 50,
    use_gauss_seidel: bool = True,
) -> dict:
    """Sinusoidal initial error, zero RHS; V-cycle error decay per cycle.

    Reference testOneLevelVCycle
    (Source/HDK_TestGeometricMultigrid.cpp:1877-1960).  Returns L-inf / L2
    error per cycle and the average per-cycle convergence factor.
    """
    import jax.numpy as jnp

    base = build_simple_domain(grid_size)
    labels, _, _, mg_levels = expand(base)
    config = SolverConfig(use_gauss_seidel=use_gauss_seidel)
    hier = mg_mod.build_hierarchy(labels, None, mg_levels, config)
    solvable = hier.levels[0].solvable

    n = grid_size
    x, y, z = np.meshgrid(*[(np.arange(s) + 0.5) / n for s in labels.shape], indexing="ij")
    err = (
        np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y) * np.sin(2 * np.pi * z)
        + np.sin(4 * np.pi * x) * np.sin(4 * np.pi * y) * np.sin(4 * np.pi * z)
    )
    err = jnp.where(solvable, jnp.asarray(err), 0.0)
    rhs = jnp.zeros_like(err)

    linf, l2 = [], []
    xk = err
    for _ in range(num_cycles):
        xk = mg_mod.v_cycle(hier, xk, rhs, config, use_initial_guess=True)
        linf.append(float(blas.inf_norm(xk, solvable)))
        l2.append(float(blas.l2_norm(xk, solvable)))
    factors = [l2[i + 1] / l2[i] for i in range(len(l2) - 1) if l2[i] > 0]
    return {
        "l_infinity": linf,
        "l2": l2,
        "mean_convergence_factor": float(np.mean(factors)) if factors else 0.0,
    }


def run_smoother_test(
    grid_size: int = 64,
    max_smoother_iterations: int = 20,
    use_complex_domain: bool = True,
    use_solid_sphere: bool = False,
    use_gauss_seidel: bool = True,
) -> dict:
    """Iterate (3x boundary, interior, 3x boundary) and record residual norms
    + per-phase average timings.

    Reference testSmoother (Source/HDK_TestGeometricMultigrid.cpp:1962-2106).
    """
    import jax
    import jax.numpy as jnp

    if use_complex_domain:
        base, weights = build_complex_domain(grid_size, use_solid_sphere)
    else:
        base, weights = build_simple_domain(grid_size), None
    labels, exp_weights, offset, mg_levels = expand(base, weights)
    config = SolverConfig(use_gauss_seidel=use_gauss_seidel)
    hier = mg_mod.build_hierarchy(labels, exp_weights, 1, config)
    c = hier.levels[0]

    rhs = jnp.asarray(
        delta_spike_rhs(
            labels.shape, solvable=np.asarray(c.solvable), offset=offset,
            base_shape=base.shape,
        )
    )
    smooth = jax.jit(
        lambda x: mg_mod._smooth_level(x, rhs, c, config, forward=True)
    )
    res_norm = jax.jit(
        lambda x: blas.l2_norm(stencil.residual(x, rhs, c), c.solvable)
    )

    # Per-phase timing split (reference testSmoother reports boundary-phase
    # vs interior-phase averages separately,
    # Source/HDK_TestGeometricMultigrid.cpp:2104-2105).  Timed on the jnp
    # operators so the phases are separable; the combined loop below uses
    # the production (possibly fused) block.
    def boundary_phase(x):
        for _ in range(config.boundary_iterations):
            x = stencil.boundary_jacobi(x, rhs, c, config.jacobi_damping)
        return x

    def interior_phase(x):
        if config.use_gauss_seidel:
            return stencil.rb_gauss_seidel(x, rhs, c, forward=True)
        return stencil.jacobi_smooth(x, rhs, c, config.jacobi_damping)

    boundary_phase = jax.jit(boundary_phase)
    interior_phase = jax.jit(interior_phase)

    x = jnp.zeros_like(rhs)
    norms = [float(res_norm(x))]
    times = []
    boundary_times = []
    interior_times = []
    for _ in range(max_smoother_iterations):
        t0 = time.time()
        xb = jax.block_until_ready(boundary_phase(x))
        t1 = time.time()
        xi = jax.block_until_ready(interior_phase(xb))
        t2 = time.time()
        jax.block_until_ready(boundary_phase(xi))
        t3 = time.time()
        boundary_times.append((t1 - t0) + (t3 - t2))
        interior_times.append(t2 - t1)

        t0 = time.time()
        x = jax.block_until_ready(smooth(x))
        times.append(time.time() - t0)
        norms.append(float(res_norm(x)))

    def _avg(ts):
        return float(np.mean(ts[1:])) if len(ts) > 1 else ts[0]

    return {
        "residual_l2": norms,
        "avg_smooth_seconds": _avg(times),
        "avg_boundary_phase_seconds": _avg(boundary_times),
        "avg_interior_phase_seconds": _avg(interior_times),
    }


# ---------------------------------------------------------------------------
# CLI (the node's parameter sheet, TestGeometricMultigrid.cpp:40-168)
# ---------------------------------------------------------------------------


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--grid-size", type=int, default=64)
    p.add_argument("--test-conjugate-gradient", action="store_true")
    p.add_argument("--test-symmetry", action="store_true")
    p.add_argument("--test-one-level-v-cycle", action="store_true")
    p.add_argument("--test-smoother", action="store_true")
    p.add_argument("--use-complex-domain", action="store_true", default=True)
    p.add_argument("--use-simple-domain", dest="use_complex_domain", action="store_false")
    p.add_argument("--use-solid-sphere", action="store_true")
    p.add_argument("--use-random-initial-guess", action="store_true")
    p.add_argument("--solve-with-multigrid", action="store_true", default=True)
    p.add_argument(
        "--solve-with-diagonal",
        dest="solve_with_multigrid",
        action="store_false",
    )
    p.add_argument("--tolerance", type=float, default=1e-5)
    p.add_argument("--max-iterations", type=int, default=1000)
    p.add_argument(
        "--dx", type=float, default=None,
        help="grid spacing for the dx^2 RHS-scaling round trip "
        "(reference HDK_TestGeometricMultigrid.cpp:792-794)",
    )
    p.add_argument("--num-cycles", type=int, default=50)
    p.add_argument("--max-smoother-iterations", type=int, default=20)
    args = p.parse_args(argv)

    np.set_printoptions(precision=10)
    any_ran = False

    if args.test_conjugate_gradient:
        any_ran = True
        r = run_conjugate_gradient_test(
            args.grid_size,
            use_complex_domain=args.use_complex_domain,
            use_solid_sphere=args.use_solid_sphere,
            use_mg_preconditioner=args.solve_with_multigrid,
            use_random_guess=args.use_random_initial_guess,
            tolerance=args.tolerance,
            max_iterations=args.max_iterations,
            dx=args.dx,
        )
        print("== testConjugateGradient ==")
        for k, v in r.items():
            print(f"  {k}: {v:.10g}" if isinstance(v, float) else f"  {k}: {v}")

    if args.test_symmetry:
        any_ran = True
        r = run_symmetry_test(
            min(args.grid_size, 32),
            use_complex_domain=args.use_complex_domain,
            use_solid_sphere=args.use_solid_sphere,
        )
        print("== testSymmetry (relative asymmetry; must be < 1e-10) ==")
        for k, v in r.items():
            status = "OK" if v < 1e-10 else "FAIL"
            print(f"  {k}: {v:.3e}  [{status}]")

    if args.test_one_level_v_cycle:
        any_ran = True
        r = run_one_level_vcycle_test(
            args.grid_size, num_cycles=args.num_cycles
        )
        print("== testOneLevelVCycle ==")
        for i, (li, l2) in enumerate(zip(r["l_infinity"], r["l2"])):
            print(f"  cycle {i + 1}: L-inf {li:.10e}  L2 {l2:.10e}")
        print(f"  mean convergence factor: {r['mean_convergence_factor']:.4f}")

    if args.test_smoother:
        any_ran = True
        r = run_smoother_test(
            args.grid_size,
            max_smoother_iterations=args.max_smoother_iterations,
            use_complex_domain=args.use_complex_domain,
            use_solid_sphere=args.use_solid_sphere,
        )
        print("== testSmoother ==")
        for i, v in enumerate(r["residual_l2"]):
            print(f"  iteration {i}: residual L2 {v:.10e}")
        print(f"  avg smoother block: {r['avg_smooth_seconds'] * 1e3:.3f} ms")
        print(
            f"  avg boundary phase: {r['avg_boundary_phase_seconds'] * 1e3:.3f} ms"
            f"  avg interior phase: {r['avg_interior_phase_seconds'] * 1e3:.3f} ms"
        )

    if not any_ran:
        print("no test toggles given; see --help (mirrors the reference node's toggles)")


if __name__ == "__main__":
    main()
