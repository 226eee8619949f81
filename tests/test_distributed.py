"""Multi-host entry point (parallel/distributed.py; VERDICT r2 missing #1).

Two layers: pure helper tests on the in-process 8-device mesh, and a REAL
two-process dryrun (spawned subprocesses + gloo CPU collectives) matching
a single-process run of the same problem -- the BASELINE.md row-5
configuration in miniature.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometricmultigridpressuresolver_tpu.parallel import distributed, make_mesh
from tests import helpers

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_process_local_slices_cover_grid():
    mesh = make_mesh(8)
    shape = (16, 16, 16)
    seen = np.zeros(shape, dtype=np.int32)
    for idx, device in distributed.process_local_slices(shape, mesh):
        seen[idx] += 1
    # Single-process: every device is addressable, so the slices tile the
    # grid exactly once per replica set.
    assert seen.min() >= 1
    assert (seen == seen.flat[0]).all()


def test_make_global_grid_roundtrip():
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    full = rng.standard_normal((16, 16, 16))
    arr = distributed.make_global_grid(full.shape, full, mesh)
    np.testing.assert_array_equal(np.asarray(arr), full)

    # Callable form: each block materialized on demand.
    arr2 = distributed.make_global_grid(full.shape, lambda idx: full[idx], mesh)
    np.testing.assert_array_equal(np.asarray(arr2), full)


def test_distribute_problem_matches_shard_problem():
    from geometricmultigridpressuresolver_tpu.parallel import shard_grid, shard_problem
    from geometricmultigridpressuresolver_tpu.solver import mgpcg

    mesh = make_mesh(8)
    labels, weights, mg_levels = helpers.expanded_domain(helpers.simple_domain, 16)
    from geometricmultigridpressuresolver_tpu.config import SolverConfig

    config = SolverConfig(tolerance=1e-8)
    problem = mgpcg.build_problem(labels, weights, mg_levels, config)
    rhs = jnp.asarray(helpers.random_solvable_field(labels, seed=5))

    a = mgpcg.solve(shard_problem(problem, mesh), shard_grid(rhs, mesh), config=config)
    b = mgpcg.solve(
        distributed.distribute_problem(problem, mesh),
        distributed.distribute_grid(rhs, mesh),
        config=config,
    )
    assert int(a.iterations) == int(b.iterations)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), rtol=0, atol=1e-12)

    assert distributed.host_local_dofs(problem.fine.solvable) == int(
        np.asarray(problem.fine.solvable).sum()
    )


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dryrun():
    """Spawn two processes (4 virtual devices each); the 8-device global
    solve must match a single-process solve of the same problem."""
    from geometricmultigridpressuresolver_tpu import diagnostics
    from geometricmultigridpressuresolver_tpu.config import SolverConfig
    from geometricmultigridpressuresolver_tpu.solver import mgpcg

    n, tol = 16, 1e-8
    base = diagnostics.build_simple_domain(n)
    labels, weights, offset, mg_levels = diagnostics.expand(base)
    config = SolverConfig(tolerance=tol)
    problem = mgpcg.build_problem(labels, weights, mg_levels, config)
    solvable = np.asarray(problem.fine.solvable)
    rhs = diagnostics.delta_spike_rhs(
        labels.shape, solvable=solvable, offset=offset, base_shape=base.shape
    )
    ref = mgpcg.solve(problem, jnp.asarray(rhs), config=config)

    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = REPO  # deliberately WITHOUT any site hooks
    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.join(REPO, "benchmarks", "multihost_dryrun.py"),
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(i),
                "--n", str(n), "--tolerance", str(tol),
            ],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err[-2000:]}"
    results = [
        json.loads(line)
        for rc, out, _ in outs
        for line in out.splitlines()
        if line.startswith("{")
    ]
    assert len(results) == 2
    total_global = {r["global_devices"] for r in results}
    assert total_global == {8}
    # Both processes agree with each other and with the single-process run.
    assert results[0]["iterations"] == results[1]["iterations"] == int(ref.iterations)
    for r in results:
        assert r["converged"]
        assert abs(r["relative_residual"] - float(ref.relative_residual)) < 1e-10
    # Each process holds half the device shards; DOF shares sum to the total.
    assert results[0]["local_dofs"] + results[1]["local_dofs"] == int(solvable.sum())
