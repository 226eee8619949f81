"""Mosaic-compile exposure for the sharded smoother on ONE real chip.

The multichip dryrun necessarily runs the shard_map + halo-exchange kernel
path in interpret mode on virtual CPU devices; this script compiles the
SAME `smooth_level_sharded` wrapper through Mosaic on the real TPU under a
degenerate (1, 1, 1) mesh -- shard_map with mesh size 1 still lowers the
wrapped pallas_call -- and asserts bit-equality with the single-device
kernel (no sharded axes => no halo arithmetic => identical programs modulo
the shard_map wrapper).

Usage: python benchmarks/sharded_mosaic_1dev.py [n]   (default 64)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gmg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from geometricmultigridpressuresolver_tpu.config import SolverConfig
    from geometricmultigridpressuresolver_tpu.models import free_surface, sdf
    from geometricmultigridpressuresolver_tpu.ops import pallas_smoother
    from geometricmultigridpressuresolver_tpu.parallel import pallas_sharded

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    # coarse_dof_target=1: deep hierarchy => generous exterior padding =>
    # the fine level is kernel-eligible at this small grid (the same
    # geometry the multichip dryrun uses).
    config = SolverConfig(
        solve_dtype=jnp.float32, mg_dtype=jnp.float32, tolerance=1e-5,
        coarse_dof_target=1,
    )

    @jax.jit
    def _scene():
        liquid_phi, _ = sdf.splash_scene((n, n, n), xp=jnp)
        weights = sdf.open_box_weights((n, n, n), xp=jnp)
        return liquid_phi, weights

    liquid_phi, weights = jax.block_until_ready(_scene())
    setup = free_surface.build_setup(liquid_phi, weights, config=config)
    c = setup.problem.hier.levels[0]
    log(f"fine level {c.shape}")

    rng = np.random.default_rng(41)
    solv = np.asarray(c.solvable)
    x = jnp.asarray(
        np.where(solv, rng.standard_normal(c.shape), 0.0), jnp.float32
    )
    b = jnp.asarray(
        np.where(solv, rng.standard_normal(c.shape), 0.0), jnp.float32
    )

    mesh1 = jax.sharding.Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1, 1), ("x", "y", "z")
    )

    ref = jax.block_until_ready(
        pallas_smoother.smooth_level_pallas(x, b, c, config, forward=True)
    )
    t0 = time.time()
    got = jax.block_until_ready(
        pallas_sharded.smooth_level_sharded(
            x, b, c, config, forward=True, mesh=mesh1, interpret=False
        )
    )
    t_compile = time.time() - t0
    bit_equal = bool(jnp.all(got == ref))
    log(f"shard_map-wrapped Mosaic kernel compiled+ran in {t_compile:.1f}s")

    # The fused downstroke pair (zero-x entry + residual emission) too --
    # the exact configuration the production V-cycle runs.
    ref2 = pallas_smoother.smooth_level_pallas(
        jnp.zeros_like(b), b, c, config, forward=True,
        x_is_zero=True, emit_residual=True,
    )
    got2 = pallas_sharded.smooth_level_sharded(
        jnp.zeros_like(b), b, c, config, forward=True, mesh=mesh1,
        interpret=False, x_is_zero=True, emit_residual=True,
    )
    bit_equal2 = bool(
        jnp.all(got2[0] == ref2[0]) & jnp.all(got2[1] == ref2[1])
    )

    print(
        json.dumps(
            {
                "n": n,
                "level_shape": list(c.shape),
                "mosaic_compiled": True,
                "bit_equal_smooth": bit_equal,
                "bit_equal_zero_x_residual": bit_equal2,
            }
        )
    )
    if not (bit_equal and bit_equal2):
        sys.exit(1)


if __name__ == "__main__":
    main()
