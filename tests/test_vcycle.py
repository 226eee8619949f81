"""V-cycle convergence and MGPCG end-to-end tests.

Mirrors the reference test node's testOneLevelVCycle (error-decay check,
Source/HDK_TestGeometricMultigrid.cpp:1877-1960) and testConjugateGradient
(grid MGPCG vs assembled-matrix oracle, cpp:675-1165).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg

from geometricmultigridpressuresolver_tpu.config import SolverConfig
from geometricmultigridpressuresolver_tpu.models import assembled
from geometricmultigridpressuresolver_tpu.ops import blas, domain, stencil
from geometricmultigridpressuresolver_tpu.solver import cg as cg_mod
from geometricmultigridpressuresolver_tpu.solver import mg as mg_mod
from geometricmultigridpressuresolver_tpu.solver import mgpcg
from tests import helpers


def sinusoidal_error(shape, solvable):
    x, y, z = np.meshgrid(*[np.arange(s, dtype=float) / s for s in shape], indexing="ij")
    err = np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y) * np.sin(2 * np.pi * z)
    err[~np.asarray(solvable)] = 0.0
    return jnp.asarray(err)


@pytest.mark.parametrize("use_gs", [True, False])
def test_vcycle_error_decay(use_gs):
    """Zero RHS, sinusoidal initial error: V-cycles must contract fast."""
    labels, weights, mg_levels = helpers.expanded_domain(helpers.simple_domain, 16)
    config = SolverConfig(use_gauss_seidel=use_gs)
    hier = mg_mod.build_hierarchy(labels, weights, mg_levels, config)
    c = hier.levels[0]

    x = sinusoidal_error(c.shape, c.solvable)
    b = jnp.zeros_like(x)

    step = jax.jit(
        lambda x: mg_mod.v_cycle(hier, x, b, config, use_initial_guess=True)
    )
    e0 = float(blas.l2_norm(x, c.solvable))
    errors = [e0]
    for _ in range(10):
        x = step(x)
        errors.append(float(blas.l2_norm(x, c.solvable)))

    # Average contraction factor per cycle well below 1 (McAdams-style MG
    # typically ~0.1-0.5 per V(1,1) cycle).
    rate = (errors[-1] / errors[0]) ** (1 / 10)
    assert rate < 0.5, errors
    assert errors[-1] < 1e-4 * errors[0]
    assert all(b < a for a, b in zip(errors, errors[1:])), errors


@pytest.mark.parametrize(
    "builder,fractional",
    [
        (helpers.simple_domain, False),
        (helpers.sine_dirichlet_domain, True),
    ],
)
def test_mgpcg_matches_direct_solve(builder, fractional):
    labels, weights, mg_levels = helpers.expanded_domain(builder, 16, fractional=fractional)
    config = SolverConfig(tolerance=1e-8)
    problem = mgpcg.build_problem(labels, weights, mg_levels, config, validate=True)

    rhs = jnp.asarray(helpers.random_solvable_field(labels, seed=8))
    result = mgpcg.solve(problem, rhs, config=config)
    assert bool(result.converged)
    assert int(result.iterations) < 60

    a, idx = assembled.assemble_poisson(labels, weights)
    x_ref = scipy.sparse.linalg.spsolve(a.tocsc(), assembled.grid_to_vec(np.asarray(rhs), idx))
    x_ref_grid = assembled.vec_to_grid(x_ref, idx, labels.shape)

    diff = np.asarray(result.x) - x_ref_grid
    rel = np.linalg.norm(diff) / np.linalg.norm(x_ref_grid)
    assert rel < 1e-6, rel

    # Recomputed residual diagnostics agree with the convergence claim.
    rel_l2, linf = cg_mod.recomputed_residual_norms(
        lambda v: stencil.apply_poisson(v, problem.fine), result.x, rhs, problem.fine.solvable
    )
    assert float(rel_l2) < 1e-7


def test_mgpcg_delta_spike():
    """Reference RHS fixture: 3^3 delta spike of amplitude 1000 at 10% of
    the grid (Source/HDK_TestGeometricMultigrid.cpp:727-742)."""
    labels, weights, mg_levels = helpers.expanded_domain(helpers.simple_domain, 16)
    config = SolverConfig(tolerance=1e-6)
    problem = mgpcg.build_problem(labels, weights, mg_levels, config)

    rhs = np.zeros(labels.shape)
    spot = tuple(max(2, s // 10) for s in labels.shape)
    rhs[spot[0] : spot[0] + 3, spot[1] : spot[1] + 3, spot[2] : spot[2] + 3] = 1000.0
    rhs[~domain.is_solvable(labels)] = 0.0
    rhs = jnp.asarray(rhs)

    result = mgpcg.solve(problem, rhs, config=config)
    assert bool(result.converged)
    assert float(result.relative_residual) <= 1e-6


def test_mgpcg_warm_start_and_zero_rhs():
    labels, weights, mg_levels = helpers.expanded_domain(helpers.simple_domain, 16)
    config = SolverConfig(tolerance=1e-7)
    problem = mgpcg.build_problem(labels, weights, mg_levels, config)

    rhs = jnp.asarray(helpers.random_solvable_field(labels, seed=9))
    first = mgpcg.solve(problem, rhs, config=config)
    # Warm start from the converged solution: should converge (almost)
    # immediately.
    warm = mgpcg.solve(problem, rhs, x0=first.x, config=config)
    assert int(warm.iterations) <= 1

    zero = mgpcg.solve(problem, jnp.zeros_like(rhs), config=config)
    assert bool(zero.converged)
    assert int(zero.iterations) == 0
    assert float(blas.inf_norm(zero.x, problem.fine.solvable)) == 0.0


def test_diagonal_preconditioner_path():
    labels, weights, mg_levels = helpers.expanded_domain(helpers.simple_domain, 16)
    config = SolverConfig(tolerance=1e-5, use_mg_preconditioner=False, max_iterations=2000)
    problem = mgpcg.build_problem(labels, weights, mg_levels, config)
    rhs = jnp.asarray(helpers.random_solvable_field(labels, seed=10))
    result = mgpcg.solve(problem, rhs, config=config)
    assert bool(result.converged)
    # MG preconditioning must be dramatically cheaper in iterations.
    config_mg = SolverConfig(tolerance=1e-5)
    mg_result = mgpcg.solve(problem, rhs, config=config_mg)
    assert int(mg_result.iterations) * 4 < int(result.iterations)


def test_mixed_precision_preconditioner():
    labels, weights, mg_levels = helpers.expanded_domain(
        helpers.sine_dirichlet_domain, 16, fractional=True
    )
    config = SolverConfig(tolerance=1e-8, mg_dtype=jnp.float32)
    problem = mgpcg.build_problem(labels, weights, mg_levels, config)
    rhs = jnp.asarray(helpers.random_solvable_field(labels, seed=12))
    result = mgpcg.solve(problem, rhs, config=config)
    assert bool(result.converged)
    # fp32 V-cycle still preconditions an fp64 CG to tight tolerance.
    rel_l2, _ = cg_mod.recomputed_residual_norms(
        lambda v: stencil.apply_poisson(v, problem.fine), result.x, rhs, problem.fine.solvable
    )
    assert float(rel_l2) < 1e-7


def test_chebyshev_smoother_option():
    """Optional Chebyshev interior smoother (beyond-reference extra): the
    cycle must stay symmetric and the MGPCG solve must converge."""
    import jax

    from geometricmultigridpressuresolver_tpu.ops import blas
    from tests import helpers

    labels, weights, mg_levels = helpers.expanded_domain(
        helpers.sine_dirichlet_domain, 16, fractional=True
    )
    config = SolverConfig(interior_smoother="chebyshev", chebyshev_degree=3)
    hier = mg_mod.build_hierarchy(labels, weights, mg_levels, config)
    solvable = hier.levels[0].solvable

    def op(rhs):
        x = mg_mod.v_cycle(hier, jnp.zeros_like(rhs), rhs, config)
        return mg_mod.v_cycle(hier, x, rhs, config, use_initial_guess=True)

    rng = np.random.default_rng(4)
    a = jnp.where(solvable, jnp.asarray(rng.standard_normal(labels.shape)), 0.0)
    b = jnp.where(solvable, jnp.asarray(rng.standard_normal(labels.shape)), 0.0)
    jop = jax.jit(op)
    dot_a = float(blas.dot(jop(a), b, solvable))
    dot_b = float(blas.dot(jop(b), a, solvable))
    assert abs(dot_a - dot_b) / max(abs(dot_a), abs(dot_b)) < 1e-10

    problem = mgpcg.build_problem(labels, weights, mg_levels, config)
    rhs = jnp.where(solvable, jnp.asarray(rng.standard_normal(labels.shape)), 0.0)
    result = mgpcg.solve(problem, rhs, config=SolverConfig(
        interior_smoother="chebyshev", chebyshev_degree=3,
        tolerance=1e-8, max_iterations=200,
    ))
    assert bool(result.converged)
    assert int(result.iterations) < 60


def test_coarse_cholesky_path(monkeypatch):
    """Forcing the Cholesky coarse representation gives the same exact
    solve as the dense inverse (reference SimplicialCholesky,
    Source/HDK_GeometricMultigridPoissonSolver.cpp:405-411)."""
    labels, weights, mg_levels = helpers.expanded_domain(helpers.simple_domain, 16)
    config = SolverConfig()
    hier_inv = mg_mod.build_hierarchy(labels, weights, mg_levels, config)
    assert hier_inv.coarse_chol.shape == (0, 0)

    monkeypatch.setattr(mg_mod, "COARSE_INVERSE_MAX_PAD", 0)
    hier_ch = mg_mod.build_hierarchy(labels, weights, mg_levels, config)
    assert hier_ch.coarse_chol.shape[0] > 0
    assert hier_ch.coarse_minv.shape == (0, 0)

    shape = hier_ch.levels[-1].shape
    rng = np.random.default_rng(3)
    b = jnp.where(
        hier_ch.levels[-1].solvable,
        jnp.asarray(rng.standard_normal(shape)),
        0.0,
    )
    x_inv = np.asarray(mg_mod.coarse_solve(hier_inv, b))
    x_ch = np.asarray(mg_mod.coarse_solve(hier_ch, b))
    np.testing.assert_allclose(x_ch, x_inv, atol=1e-10)

    # Symmetry of the coarse solve operator (test block (c) of the
    # reference symmetry suite) holds for the factorized form too.
    b2 = jnp.where(
        hier_ch.levels[-1].solvable,
        jnp.asarray(rng.standard_normal(shape)),
        0.0,
    )
    solv = hier_ch.levels[-1].solvable
    d1 = float(blas.dot(mg_mod.coarse_solve(hier_ch, b), b2, solv))
    d2 = float(blas.dot(mg_mod.coarse_solve(hier_ch, b2), b, solv))
    assert abs(d1 - d2) / max(abs(d1), abs(d2)) < 1e-10

    # End-to-end: the full MGPCG still converges with the chol coarse path.
    problem = mgpcg.build_problem(labels, weights, mg_levels, config)
    assert problem.hier.coarse_chol.shape[0] > 0
    rhs = jnp.asarray(helpers.random_solvable_field(labels, seed=4))
    result = mgpcg.solve(problem, rhs, config=SolverConfig(tolerance=1e-8))
    assert bool(result.converged)
    rel_l2, _ = cg_mod.recomputed_residual_norms(
        lambda v: stencil.apply_poisson(v, problem.fine),
        result.x, rhs, problem.fine.solvable,
    )
    assert float(rel_l2) < 1e-7


def test_coarse_cholesky_fp32_theta_clamped(monkeypatch):
    """fp32 conditioning: near-degenerate theta-clamped ghost-fluid weights
    (ratios up to 1/theta_clamp = 100 on the diagonal) still converge
    end-to-end with the Cholesky coarse representation forced."""
    monkeypatch.setattr(mg_mod, "COARSE_INVERSE_MAX_PAD", 0)
    labels, weights, mg_levels = helpers.expanded_domain(
        helpers.sine_dirichlet_domain, 16, fractional=True
    )
    config = SolverConfig(solve_dtype=jnp.float32, tolerance=1e-5)
    problem = mgpcg.build_problem(labels, weights, mg_levels, config)
    assert problem.hier.coarse_chol.dtype == jnp.float32
    assert problem.hier.coarse_chol.shape[0] > 0

    rhs = jnp.asarray(
        helpers.random_solvable_field(labels, seed=5), dtype=jnp.float32
    )
    result = mgpcg.solve(problem, rhs, config=config)
    assert bool(result.converged)
    rel_l2, _ = cg_mod.recomputed_residual_norms(
        lambda v: stencil.apply_poisson(v, problem.fine),
        result.x, rhs, problem.fine.solvable,
    )
    assert float(rel_l2) < 2e-5, float(rel_l2)


def test_cooperative_interruption():
    """Opt-in UT_Interrupt analogue: a host callback checked per iteration
    stops the solve early with the best solution so far (reference checks
    UT_Interrupt in every loop, Source/HDK_GeometricMultigridOperators.h:293)."""
    labels, weights, mg_levels = helpers.expanded_domain(helpers.simple_domain, 16)
    config = SolverConfig(tolerance=1e-12, max_iterations=100)
    problem = mgpcg.build_problem(labels, weights, mg_levels, config)
    rhs = jnp.asarray(helpers.random_solvable_field(labels, seed=31))

    seen = []

    def interrupt_after_3(iteration):
        seen.append(iteration)
        return iteration >= 3

    result = mgpcg.solve(
        problem, rhs, config=config, interrupt_check=interrupt_after_3
    )
    assert int(result.iterations) == 3
    assert not bool(result.converged)
    assert seen and max(seen) == 3
    # The partial solution is still a real CG iterate (finite, nonzero).
    assert np.isfinite(np.asarray(result.x)).all()
    assert float(blas.l2_norm(result.x, problem.fine.solvable)) > 0

    # Never interrupting reproduces the plain solve exactly.
    base = mgpcg.solve(problem, rhs, config=SolverConfig(tolerance=1e-8))
    never = mgpcg.solve(
        problem, rhs, config=SolverConfig(tolerance=1e-8),
        interrupt_check=lambda it: False,
    )
    assert int(base.iterations) == int(never.iterations)
    np.testing.assert_array_equal(np.asarray(base.x), np.asarray(never.x))


@pytest.mark.parametrize("k", [1, 2])
def test_boundary_iterations_schedule_converges(k):
    """The boundary-pass count k is a schedule knob, not a correctness
    constant (the reference hard-codes 3,
    HDK_GeometricMultigridPoissonSolver.cpp:141-142): shallower stacks must
    still converge, near the k=3 iteration count, to the same answer.
    Guards the BENCH_BOUNDARY_ITERS wall-clock A/B (benchmarks/
    round4_measure.sh) against silently trading away robustness."""
    labels, weights, mg_levels = helpers.expanded_domain(
        helpers.sine_dirichlet_domain, 16, fractional=True
    )
    rhs = jnp.asarray(helpers.random_solvable_field(labels, seed=12))

    def solve_with(iters):
        config = SolverConfig(tolerance=1e-8, boundary_iterations=iters)
        problem = mgpcg.build_problem(labels, weights, mg_levels, config)
        return mgpcg.solve(problem, rhs, config=config), problem

    base, problem = solve_with(3)
    got, _ = solve_with(k)
    assert bool(got.converged)
    # Shallower boundary stacks may cost a few extra CG iterations; more
    # than that signals the schedule broke the preconditioner.
    assert int(got.iterations) <= int(base.iterations) + 4, (
        int(got.iterations), int(base.iterations),
    )
    np.testing.assert_allclose(
        np.asarray(got.x), np.asarray(base.x), atol=5e-7
    )
