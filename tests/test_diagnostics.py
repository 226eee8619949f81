"""Tests for the diagnostic suite (the reference test node as a library).

Reference: HDK_TestGeometricMultigrid's four toggle blocks
(Source/HDK_TestGeometricMultigrid.cpp:627-2109).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from geometricmultigridpressuresolver_tpu import diagnostics
from geometricmultigridpressuresolver_tpu.config import SolverConfig
from geometricmultigridpressuresolver_tpu.models import free_surface, sdf
from geometricmultigridpressuresolver_tpu.ops import domain
from geometricmultigridpressuresolver_tpu.utils import instrumented_solve


@pytest.mark.parametrize("use_solid_sphere", [False, True])
def test_complex_domain_invariants(use_solid_sphere):
    labels, weights = diagnostics.build_complex_domain(
        24, use_solid_sphere=use_solid_sphere
    )
    expanded, exp_weights, _, _ = diagnostics.expand(labels, weights)
    assert domain.check_exterior_shell(expanded)
    assert domain.check_boundary_cells(expanded, exp_weights)
    if use_solid_sphere:
        # The sphere must actually produce fractional cut-cell weights.
        has_fractional = any(
            bool(((w > 0) & (w < 1)).any()) for w in exp_weights
        )
        assert has_fractional


def test_conjugate_gradient_block_matches_oracle():
    r = diagnostics.run_conjugate_gradient_test(
        grid_size=20,
        use_complex_domain=True,
        use_solid_sphere=True,
        tolerance=1e-9,
        max_iterations=500,
    )
    assert r["relative_l2"] < 1e-8
    assert r["max_relative_difference_vs_oracle"] < 1e-6
    assert r["dofs"] > 0


def test_one_level_vcycle_convergence_rate():
    r = diagnostics.run_one_level_vcycle_test(grid_size=32, num_cycles=8)
    # Geometric multigrid on the Dirichlet cube must contract fast; the
    # McAdams scheme achieves per-cycle factors well under 1/2 (measured
    # ~0.39 for the V(1,1) red/black-GS cycle at 32^3).
    assert r["mean_convergence_factor"] < 0.5
    assert r["l2"][-1] < r["l2"][0] * 0.5**7


def test_smoother_block_reduces_residual():
    r = diagnostics.run_smoother_test(
        grid_size=24, max_smoother_iterations=6, use_complex_domain=True
    )
    assert r["residual_l2"][-1] < r["residual_l2"][0]


def test_symmetry_block():
    r = diagnostics.run_symmetry_test(16, use_complex_domain=True, use_solid_sphere=False)
    for name, v in r.items():
        assert v < 1e-10, (name, v)


def test_instrumented_solve_matches_production():
    config = SolverConfig(tolerance=1e-6, max_iterations=100)
    phi, velocity = sdf.splash_scene((20, 20, 20))
    weights = sdf.open_box_weights((20, 20, 20))
    setup = free_surface.build_setup(phi, weights, config=config)
    velocity = tuple(jnp.asarray(v) for v in velocity)
    rhs_base = free_surface.negative_divergence(
        setup.liquid_mask, velocity, setup.weights
    )
    rhs = free_surface._embed(rhs_base, setup)

    from geometricmultigridpressuresolver_tpu.solver import mgpcg

    x_inst, times = instrumented_solve(
        setup.problem, rhs, config=config, print_stats=False
    )
    result = mgpcg.solve(setup.problem, rhs, config=config)
    np.testing.assert_allclose(
        np.asarray(x_inst), np.asarray(result.x), rtol=0, atol=1e-12
    )
    assert times.calls["matvec"] == int(result.iterations)
