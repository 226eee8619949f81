"""Minimal incompressible free-surface simulation driver.

The reference's end-to-end oracle is `Scenes/flipSplash.hip`: a FLIP splash
simulation with the pressure node in the loop, exercising per-frame label
rebuilds, warm-started solves, and the post-projection divergence audit
(SURVEY.md section 4.3).  This module is that scene without Houdini: a
semi-Lagrangian advect -> gravity -> MGPCG-project loop over the SDF and
MAC velocity.  It is intentionally simple (first-order advection, no
particles) -- its job is to drive the pressure pipeline the way a real
fluid solver does, not to be a production FLIP.

Every step rebuilds the projection setup (the liquid topology changes
frame to frame, exactly like the reference's per-cook label rebuild) and
warm-starts CG from the previous pressure (reference `useOldPressure`,
Source/HDK_GeometricFreeSurfacePressureSolver.cpp:408-418, 945-997).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from geometricmultigridpressuresolver_tpu.config import SolverConfig
from geometricmultigridpressuresolver_tpu.models import free_surface


def _cell_center_velocity(velocity: Sequence[jax.Array]) -> tuple:
    """Average MAC faces to cell centers, per component."""
    out = []
    for axis in range(3):
        v = velocity[axis]
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        out.append(0.5 * (v[tuple(lo)] + v[tuple(hi)]))
    return tuple(out)


def _sample(field: jax.Array, idx: Sequence[jax.Array]) -> jax.Array:
    """Trilinear sample at (fractional) index coordinates, edge-clamped."""
    return map_coordinates(field, list(idx), order=1, mode="nearest")


def _index_grid(shape, axis: int | None):
    """Index coordinates of cell centers (axis=None) or face centers."""
    coords = []
    for a in range(3):
        n = shape[a] + (1 if a == axis else 0)
        # Cell center i sits at index i; face i along its own axis at i-0.5.
        offset = -0.5 if a == axis else 0.0
        coords.append(jnp.arange(n, dtype=jnp.float32) + offset)
    return jnp.meshgrid(*coords, indexing="ij")


@functools.partial(jax.jit, static_argnames=("dt", "dx"))
def advect_scalar(field: jax.Array, velocity, dt: float, dx: float) -> jax.Array:
    """Semi-Lagrangian advection of a cell-centered field."""
    vc = _cell_center_velocity(velocity)
    idx = _index_grid(field.shape, None)
    back = [idx[a] - (dt / dx) * vc[a] for a in range(3)]
    return _sample(field, back)


@functools.partial(jax.jit, static_argnames=("dt", "dx"))
def advect_velocity(velocity, dt: float, dx: float) -> tuple:
    """Semi-Lagrangian advection of each MAC component."""
    vc_cell = _cell_center_velocity(velocity)
    out = []
    for axis in range(3):
        idx = _index_grid(vc_cell[0].shape, axis)
        # Full velocity at this component's face positions.
        vel_at_face = [
            velocity[a] if a == axis
            else _sample(vc_cell[a], [i for i in idx])
            for a in range(3)
        ]
        back = [idx[a] - (dt / dx) * vel_at_face[a] for a in range(3)]
        # `back` is in cell space (face i at coordinate i - 0.5 along its
        # own axis); the face ARRAY stores face i at index i, so shift by
        # +0.5 along the component's own axis before sampling.
        back[axis] = back[axis] + 0.5
        out.append(_sample(velocity[axis], back))
    return tuple(out)


class FrameResult(NamedTuple):
    liquid_phi: jax.Array
    velocity: tuple
    pressure: jax.Array
    iterations: int
    relative_residual: float
    max_divergence: float
    setup: free_surface.ProjectionSetup  # pass as next frame's reuse_setup


def step(
    liquid_phi: jax.Array,
    velocity: Sequence[jax.Array],
    cut_cell_weights: Sequence[jax.Array],
    dt: float,
    gravity: float = -9.8,
    old_pressure: jax.Array | None = None,
    solid_phi: jax.Array | None = None,
    config: SolverConfig | None = None,
    reuse_setup: free_surface.ProjectionSetup | None = None,
) -> FrameResult:
    """One frame: advect, apply gravity, rebuild setup, project.

    `reuse_setup` (the previous frame's setup) keeps the multigrid window
    SHAPE sticky across frames, so the whole frame reuses compiled
    programs while the liquid moves -- without it, every bounding-box
    change recompiles the solve (~30-80 s/frame at 128^3 over a remote
    compiler vs <1 s warm).
    """
    # Default resolved at CALL time (not import time), so late
    # jax_enable_x64 changes are honored by the default config.
    if config is None:
        config = SolverConfig()
    dx = 1.0 / max(liquid_phi.shape)
    velocity = tuple(jnp.asarray(v, dtype=config.solve_dtype) for v in velocity)
    liquid_phi = jnp.asarray(liquid_phi, dtype=config.solve_dtype)

    new_phi = advect_scalar(liquid_phi, velocity, dt, dx)
    new_vel = list(advect_velocity(velocity, dt, dx))
    new_vel[1] = new_vel[1] + config.solve_dtype(gravity * dt)

    setup = free_surface.build_setup(
        new_phi, cut_cell_weights, solid_phi=solid_phi, config=config,
        reuse_from=reuse_setup,
    )
    # Donation: the advected velocity is dead after the projection (the
    # loop continues from result.velocity), so its buffers are recycled
    # for the output -- one full velocity field less of steady-state HBM.
    # (old_pressure is NOT donated: run() returns every frame's pressure
    # while also warm-starting from it.)
    result = free_surface.project(
        setup, tuple(new_vel), old_pressure=old_pressure, config=config,
        donate=True,
    )
    return FrameResult(
        liquid_phi=new_phi,
        velocity=result.velocity,
        pressure=result.pressure,
        iterations=int(result.cg.iterations),
        relative_residual=float(result.cg.relative_residual),
        max_divergence=float(result.max_divergence),
        setup=setup,
    )


def main(argv=None):
    """CLI driver: the flipSplash loop as a command.

    The reference ships `Scenes/flipSplash.hip` as its end-to-end demo; a
    standalone framework needs a runnable equivalent:

        gmg-tpu-simulate --n 128 --frames 24 --checkpoint-dir out/ckpt \\
                         --checkpoint-every 8 [--resume out/ckpt]
    """
    import argparse
    import time

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--n", type=int, default=64, help="grid edge")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--dt", type=float, default=1.0 / 120.0)
    p.add_argument("--gravity", type=float, default=-9.8)
    p.add_argument("--tolerance", type=float, default=1e-5)
    p.add_argument("--fp32", action="store_true",
                   help="solve in float32 (bfloat16 MG edge weights)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", default=None,
                   help="checkpoint directory to resume from")
    args = p.parse_args(argv)

    import jax

    from geometricmultigridpressuresolver_tpu.models import sdf

    kwargs = {"tolerance": args.tolerance}
    if args.fp32:
        kwargs.update(solve_dtype=jnp.float32, mg_dtype=jnp.float32,
                      mg_ew_dtype=jnp.bfloat16)
    config = SolverConfig(**kwargs)

    shape = (args.n,) * 3
    weights = sdf.open_box_weights(shape, xp=jnp)
    start_frame, old_pressure = 0, None
    if args.resume:
        start_frame, phi, velocity, old_pressure = load_state(args.resume)
        phi = jnp.asarray(phi, dtype=config.solve_dtype)
        velocity = tuple(jnp.asarray(v, config.solve_dtype) for v in velocity)
        if old_pressure is not None:
            old_pressure = jnp.asarray(old_pressure, config.solve_dtype)
        print(f"resumed frame {start_frame} from {args.resume}", flush=True)
    else:
        phi, velocity = sdf.splash_scene(shape, xp=jnp)

    def on_frame(k, fr):
        print(
            f"frame {k + 1}: iters={fr.iterations} "
            f"rel={fr.relative_residual:.2e} max|div|={fr.max_divergence:.2e} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )

    t0 = time.time()
    frames = run(
        phi, velocity, weights, num_frames=args.frames, dt=args.dt,
        gravity=args.gravity, config=config, on_frame=on_frame,
        start_frame=start_frame, old_pressure=old_pressure,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
    )
    jax.block_until_ready(frames[-1].pressure)
    print(f"{len(frames)} frames in {time.time() - t0:.1f}s "
          f"on {jax.devices()[0]}", flush=True)
    return 0


def save_state(directory, frame: int, liquid_phi, velocity, pressure=None) -> None:
    """Checkpoint the simulation state in the native tiled format (io.py).

    The reference has no checkpointing at all (Houdini owns sim state;
    SURVEY.md section 5); a standalone framework needs one.  Constant-tile
    compression makes the far-field SDF and still-water regions nearly
    free on disk.  Resume with `load_state` + `run(start_frame=...)`.
    """
    import json as _json
    from pathlib import Path

    import numpy as np

    from geometricmultigridpressuresolver_tpu import io as gmg_io

    fields = {
        "liquid_phi": np.asarray(liquid_phi),
        "velocity_u": np.asarray(velocity[0]),
        "velocity_v": np.asarray(velocity[1]),
        "velocity_w": np.asarray(velocity[2]),
    }
    if pressure is not None:
        fields["pressure"] = np.asarray(pressure)
    gmg_io.save_scene(directory, **fields)
    (Path(directory) / "state.json").write_text(
        _json.dumps({"frame": int(frame), "format": 1})
    )


def load_state(directory):
    """Load a `save_state` checkpoint -> (frame, liquid_phi, velocity,
    pressure-or-None)."""
    import json as _json
    from pathlib import Path

    from geometricmultigridpressuresolver_tpu import io as gmg_io

    meta = _json.loads((Path(directory) / "state.json").read_text())
    fields = gmg_io.load_scene(directory)
    velocity = (
        fields["velocity_u"], fields["velocity_v"], fields["velocity_w"]
    )
    return (
        int(meta["frame"]), fields["liquid_phi"], velocity,
        fields.get("pressure"),
    )


def run(
    liquid_phi,
    velocity,
    cut_cell_weights,
    num_frames: int,
    dt: float = 1.0 / 120.0,
    gravity: float = -9.8,
    solid_phi=None,
    config: SolverConfig | None = None,
    on_frame=None,
    start_frame: int = 0,
    old_pressure=None,
    checkpoint_dir=None,
    checkpoint_every: int = 0,
) -> list[FrameResult]:
    """Run `num_frames` steps, warm-starting each solve from the last
    pressure; returns per-frame results (the flipSplash loop).

    Resume support: `start_frame`/`old_pressure` continue from a
    `load_state` checkpoint; `checkpoint_dir` + `checkpoint_every` write
    one every N frames (`save_state`).
    """
    # Default resolved at CALL time (not import time), so late
    # jax_enable_x64 changes are honored by the default config.
    if config is None:
        config = SolverConfig()
    frames = []
    pressure = old_pressure
    setup = None
    for k in range(start_frame, start_frame + num_frames):
        fr = step(
            liquid_phi, velocity, cut_cell_weights, dt, gravity,
            old_pressure=pressure, solid_phi=solid_phi, config=config,
            reuse_setup=setup,
        )
        setup = fr.setup
        # Retain only the latest setup (needed for reuse): keeping one per
        # frame would accumulate the full multigrid hierarchy in HBM.
        frames.append(fr._replace(setup=None))
        liquid_phi, velocity, pressure = fr.liquid_phi, fr.velocity, fr.pressure
        if checkpoint_dir is not None and checkpoint_every and (
            (k + 1 - start_frame) % checkpoint_every == 0
        ):
            save_state(checkpoint_dir, k + 1, liquid_phi, velocity, pressure)
        if on_frame is not None:
            on_frame(k, fr)
    return frames


if __name__ == "__main__":
    import sys

    sys.exit(main())
