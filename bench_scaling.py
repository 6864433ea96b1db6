"""Scaling benchmark: mesh-parallel SVN-ICP registration across devices.

Measures `parallel.sharding.sharded_register` throughput for a ladder of
(particle, point) mesh shapes on the available devices and reports scaling
efficiency vs the 1-device mesh (BASELINE.json config 5 ladder).

On real multi-chip hardware the collectives ride ICI; with
`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N` the
same code runs on simulated devices (functional validation; efficiency
numbers on simulated devices share host cores and are NOT hardware numbers —
the output labels which mode produced them).

Prints one JSON line per mesh shape.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=256)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--target", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force the CPU backend with N simulated devices "
                         "(the shell pins JAX_PLATFORMS; env overrides do "
                         "not survive, so this must happen in-process)")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from svnicp_tpu.config import SteinICPConfig
    from svnicp_tpu.core import geometry as geo, svn
    from svnicp_tpu.parallel import sharding

    n_dev = len(jax.devices())
    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    cloud = rng.normal(size=(args.points, 3)).astype(np.float32) * 20
    xi = jnp.asarray([0.2, -0.1, 0.05, 0.01, -0.01, 0.02])
    r, t = geo.se3_exp(xi)
    target = np.asarray(
        geo.transform_points(r, t, jnp.asarray(
            rng.normal(size=(args.target, 3)).astype(np.float32) * 20))
    )
    cfg = SteinICPConfig(
        particle_count=args.particles, iterations=args.iters, lr=1.0,
        max_dist=3.0, knn_count=100, early_stop=False,
    )
    init = svn.init_particles_uniform(
        jax.random.PRNGKey(0), args.particles, cfg.init_lb, cfg.init_ub)
    call_args = (
        jnp.asarray(cloud), jnp.ones(args.points, bool),
        jnp.asarray(target), jnp.ones(args.target, bool),
        jnp.eye(3), jnp.zeros(3), init,
    )

    shapes = [(1, 1)]
    d = 2
    while d <= n_dev:
        p_sh, pt_sh = sharding.auto_axes(d, args.particles)
        shapes.append((p_sh, pt_sh))
        d *= 2

    base_time = None
    for p_sh, pt_sh in shapes:
        mesh = sharding.make_mesh(p_sh, pt_sh)
        run = lambda: sharding.sharded_register(mesh, cfg, *call_args)
        out = run()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        if base_time is None:
            base_time = dt
        n = p_sh * pt_sh
        eff = base_time / (dt * n)
        print(json.dumps({
            "metric": "sharded_align_seconds",
            "mesh": f"{p_sh}x{pt_sh}",
            "devices": n,
            "backend": backend,
            "simulated": backend != "tpu",
            "value": round(dt, 4),
            "unit": "s/align",
            "scaling_efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
