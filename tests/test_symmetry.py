"""Preconditioner symmetry suite.

Port of the reference's key numerical property tests
(Source/HDK_TestGeometricMultigrid.cpp:1167-1876 testSymmetry): for random
rhsA, rhsB each operator M must satisfy <M a, b> = <M b, a> to 1e-10
relative.  Symmetry of the V-cycle is what legitimizes using it inside
plain CG.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometricmultigridpressuresolver_tpu.config import SolverConfig
from geometricmultigridpressuresolver_tpu.ops import blas, domain, stencil, transfer
from geometricmultigridpressuresolver_tpu.solver import mg as mg_mod
from tests import helpers

TOL = 1e-10


def build(n=16, fractional=True):
    labels, weights, mg_levels = helpers.expanded_domain(
        helpers.sine_dirichlet_domain, n, fractional=fractional
    )
    config = SolverConfig()
    hier = mg_mod.build_hierarchy(labels, weights, mg_levels, config, validate=True)
    return labels, hier, config


def sym_check(op, hier, seed=0):
    solvable = hier.levels[0].solvable
    rng = np.random.default_rng(seed)
    shape = hier.levels[0].shape
    a = jnp.where(solvable, jnp.asarray(rng.standard_normal(shape)), 0.0)
    b = jnp.where(solvable, jnp.asarray(rng.standard_normal(shape)), 0.0)
    op = jax.jit(op)
    dot_a = float(blas.dot(op(a), b, solvable))
    dot_b = float(blas.dot(op(b), a, solvable))
    denom = max(abs(dot_a), abs(dot_b), 1e-300)
    assert abs(dot_a - dot_b) / denom < TOL, (dot_a, dot_b)


@pytest.fixture(scope="module")
def domain_fixture():
    return build()


def test_boundary_jacobi_boundary_smoother_symmetry(domain_fixture):
    """(a) boundary^3 + Jacobi + boundary^3 block applied from x=0.

    Uses the Jacobi interior smoother: a single forward GS half-schedule is
    not self-adjoint (only the full down+up palindrome is, tested in (b)/(f)).
    """
    _, hier, _ = domain_fixture
    c = hier.levels[0]
    config_j = SolverConfig(use_gauss_seidel=False)

    def op(rhs):
        return mg_mod._smooth_level(
            jnp.zeros_like(rhs), rhs, c, config_j, forward=True
        )

    sym_check(op, hier)


def test_gauss_seidel_schedule_symmetry(domain_fixture):
    """(b) four rounds of the symmetric red/black GS schedule."""
    _, hier, config = domain_fixture
    c = hier.levels[0]

    def op(rhs):
        x = jnp.zeros_like(rhs)
        for _ in range(2):
            x = stencil.rb_gauss_seidel(x, rhs, c, forward=True)
            x = stencil.rb_gauss_seidel(x, rhs, c, forward=False)
        return x

    sym_check(op, hier)


def test_coarse_direct_solve_symmetry(domain_fixture):
    """(c) coarsest-level direct solve (dense inverse matmul)."""
    _, hier, _ = domain_fixture
    coarse = hier.levels[-1]
    rng = np.random.default_rng(11)
    a = jnp.where(coarse.solvable, jnp.asarray(rng.standard_normal(coarse.shape)), 0.0)
    b = jnp.where(coarse.solvable, jnp.asarray(rng.standard_normal(coarse.shape)), 0.0)
    dot_a = float(blas.dot(mg_mod.coarse_solve(hier, a), b, coarse.solvable))
    dot_b = float(blas.dot(mg_mod.coarse_solve(hier, b), a, coarse.solvable))
    assert abs(dot_a - dot_b) / max(abs(dot_a), abs(dot_b)) < TOL


def test_restriction_prolongation_symmetry(domain_fixture):
    """(d) P(R(.)) is symmetric (P proportional to R^T)."""
    _, hier, _ = domain_fixture
    fine, coarse = hier.levels[0], hier.levels[1]

    def op(rhs):
        down = transfer.restrict(rhs, coarse.solvable)
        return transfer.prolong_add(jnp.zeros_like(rhs), down, fine.solvable)

    sym_check(op, hier)


@pytest.mark.parametrize("use_gs", [True, False])
def test_two_level_vcycle_symmetry(use_gs):
    """(e) one-level V-cycle (2-grid cycle with direct coarse solve)."""
    labels, weights, mg_levels = helpers.expanded_domain(
        helpers.sine_dirichlet_domain, 16, fractional=True
    )
    config = SolverConfig(use_gauss_seidel=use_gs, max_mg_levels=2)
    hier = mg_mod.build_hierarchy(labels, weights, mg_levels, config)
    assert hier.num_levels == 2

    def op(rhs):
        return mg_mod.v_cycle(hier, jnp.zeros_like(rhs), rhs, config)

    sym_check(op, hier)


@pytest.mark.parametrize("use_gs", [True, False])
def test_full_vcycle_symmetry(use_gs):
    """(f) four accumulated applications of the full V-cycle."""
    labels, weights, mg_levels = helpers.expanded_domain(
        helpers.sine_dirichlet_domain, 16, fractional=True
    )
    config = SolverConfig(use_gauss_seidel=use_gs)
    hier = mg_mod.build_hierarchy(labels, weights, mg_levels, config)
    assert hier.num_levels >= 3

    def op(rhs):
        x = mg_mod.v_cycle(hier, jnp.zeros_like(rhs), rhs, config)
        for _ in range(3):
            x = mg_mod.v_cycle(hier, x, rhs, config, use_initial_guess=True)
        return x

    sym_check(op, hier)


def test_single_level_smoother_cycle_symmetry(domain_fixture):
    """Level-capped hierarchy degrades to the smoothing-only cycle.

    A lone forward GS half-schedule is not self-adjoint (no upstroke to
    mirror it), so the degenerate single-level cycle is only symmetric with
    the Jacobi interior smoother.
    """
    labels, _, config = domain_fixture
    weights = None
    config1 = SolverConfig(max_mg_levels=1, use_gauss_seidel=False)
    hier = mg_mod.build_hierarchy(labels, weights, 5, config1)
    assert hier.num_levels == 1

    def op(rhs):
        return mg_mod.v_cycle(hier, jnp.zeros_like(rhs), rhs, config1)

    sym_check(op, hier)
