"""Attribute build_setup wall time stage by stage (axon tunnel diagnosis).

Round-2's driver bench recorded 761.9 s of setup; a fully-warm rerun still
took 278.9 s with ZERO new compile-cache writes -- the warm cost was
per-program dispatch/executable-load overhead through the remote tunnel
(~1-2 s per distinct program, eager ops included), not compilation.
Round 3 therefore fused setup into three device programs
(free_surface._expand_build_device + _setup_base_fields + the coarse
densify); this script times the public API stages to verify the fix.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# GMG_CACHE_DIR: point at a throwaway dir to measure the COLD compile path
# without invalidating the shared warm cache (round-5 cold-setup forensics).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("GMG_CACHE_DIR", "/tmp/gmg_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools

import jax.numpy as jnp

from geometricmultigridpressuresolver_tpu.config import SolverConfig
from geometricmultigridpressuresolver_tpu.models import free_surface, sdf


def tick(label, t0):
    t = time.time()
    print(f"{label:40s} {t - t0:8.2f}s", flush=True)
    return t


def main(n=256):
    config = SolverConfig(
        solve_dtype=jnp.float32, mg_dtype=jnp.float32, mg_ew_dtype=jnp.bfloat16
    )
    t0 = time.time()

    @jax.jit
    def _scene():
        liquid_phi, velocity = sdf.splash_scene((n, n, n), xp=jnp)
        weights = sdf.open_box_weights((n, n, n), xp=jnp)
        return liquid_phi, velocity, weights

    liquid_phi, velocity, weights = jax.block_until_ready(_scene())
    t0 = tick("scene (one program)", t0)

    setup = free_surface.build_setup(liquid_phi, weights, config=config)
    jax.block_until_ready(setup.problem)
    t0 = tick("build_setup (3 programs)", t0)

    # Second frame: same shapes -> all programs already loaded.
    setup2 = free_surface.build_setup(
        liquid_phi, weights, config=config, reuse_from=setup
    )
    jax.block_until_ready(setup2.problem)
    t0 = tick("build_setup again (warm frame)", t0)

    @functools.partial(jax.jit, static_argnames=("base_pads", "expanded_shape"))
    def _rhs(liquid_mask, velocity, weights, window_start, base_pads, expanded_shape):
        rhs_base = free_surface.negative_divergence(liquid_mask, velocity, weights)
        return free_surface.embed_window(
            rhs_base, window_start, base_pads, expanded_shape
        )

    rhs = _rhs(
        setup.liquid_mask, velocity, setup.weights, setup.window_start,
        setup.base_pads, setup.expanded_shape,
    )
    jax.block_until_ready(rhs)
    t0 = tick("rhs (one program)", t0)

    ndof = int(jax.jit(lambda s: s.sum())(setup.problem.fine.solvable))
    t0 = tick(f"dof count fetch ({ndof})", t0)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
