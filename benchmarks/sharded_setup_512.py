"""Structural 512^3 sharded-setup build on the virtual 8-device mesh.

BASELINE.md row 5 names 512^3 multi-chip as the target configuration; one
16 GB v5e cannot even CONSTRUCT it (round-4 measurement: the fine-level
coefficient build alone exhausts one chip's HBM).  This script builds the
512^3 splash scene end-to-end through `build_setup(mesh=...)` on the
virtual 8-device CPU mesh -- structural validation that the sharded setup
path handles the target scale -- and prints the measured per-device memory
budget of the finished ProjectionSetup, proving 8 chips suffice.

Usage:  python benchmarks/sharded_setup_512.py [n]
(n defaults to 512; CPU-only, ~10-30 min on a 1-core host at 512^3.)
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax

# sitecustomize may have imported jax before this script's env vars took
# effect; these config knobs still work post-import (same trick as
# __graft_entry__.dryrun_multichip / tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import jax.numpy as jnp

from geometricmultigridpressuresolver_tpu.config import SolverConfig
from geometricmultigridpressuresolver_tpu.models import free_surface, sdf
from geometricmultigridpressuresolver_tpu.parallel import make_mesh


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def per_device_bytes(tree) -> dict[str, int]:
    """Exact bytes each device holds for every array leaf of `tree`."""
    out: dict[str, int] = {}
    for leaf in jax.tree_util.tree_leaves(tree):
        if not isinstance(leaf, jax.Array):
            continue
        for shard in leaf.addressable_shards:
            key = str(shard.device)
            out[key] = out.get(key, 0) + int(shard.data.nbytes)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    mesh = make_mesh(8)
    config = SolverConfig(
        solve_dtype=jnp.float32, mg_dtype=jnp.float32,
        mg_ew_dtype=jnp.bfloat16, tolerance=1e-5,
    )
    log(f"building {n}^3 splash scene on the virtual mesh {mesh.shape}")

    t0 = time.time()

    @jax.jit
    def _scene():
        liquid_phi, velocity = sdf.splash_scene((n, n, n), xp=jnp)
        weights = sdf.open_box_weights((n, n, n), xp=jnp)
        return liquid_phi, weights

    liquid_phi, weights = jax.block_until_ready(_scene())
    t_scene = time.time() - t0
    log(f"scene in {t_scene:.1f}s")

    t0 = time.time()
    setup = free_surface.build_setup(
        liquid_phi, weights, config=config, mesh=mesh
    )
    jax.block_until_ready(setup.problem)
    t_setup = time.time() - t0

    budget = per_device_bytes(setup)
    per_dev_mb = max(budget.values()) / (1 << 20)
    fusion = config.setup_fusion_resolved(setup.expanded_shape, mesh.size)
    fine_sh = setup.problem.fine.solvable.sharding
    print(
        json.dumps(
            {
                "n": n,
                "ok": True,
                "expanded_shape": list(setup.expanded_shape),
                "mg_levels": setup.mg_levels,
                "setup_fusion_resolved": fusion,
                "setup_s": round(t_setup, 1),
                "scene_s": round(t_scene, 1),
                "per_device_setup_mb": round(per_dev_mb, 1),
                "devices": len(budget),
                "fine_level_partitioned": not fine_sh.is_fully_replicated,
            }
        )
    )


if __name__ == "__main__":
    main()
