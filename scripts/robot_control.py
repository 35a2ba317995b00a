#!/usr/bin/env python
"""Physics-engine demos without any dataset or weights
(reference: monoforce/scripts/robot_control.py):

- ``motion``: one rollout with time-varying flipper angles on a step terrain,
- ``shoot``: batched shooting of sampled control sequences with wall-time
  reporting (the reference's shoot_multiple, robot_control.py:79-151).
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_terrain(cfg, kind: str = "hill"):
    gx, gy = cfg.grid_coords()
    if kind == "hill":
        return (0.5 * np.exp(-((gx - 2.0) ** 2) / 2 - gy ** 2 / 4)).astype(np.float32)
    if kind == "step":
        return (0.2 * (gx > 1.5)).astype(np.float32)
    return np.zeros_like(gx, dtype=np.float32)


def motion(args):
    from monoforce_tpu.config import PhysicsConfig
    from monoforce_tpu.physics import DPhysics
    from monoforce_tpu.vis import plot_rollout_3d

    cfg = PhysicsConfig(robot="marv")
    engine = DPhysics(cfg)
    n = cfg.n_sim_steps
    z = jnp.asarray(make_terrain(cfg, args.terrain))[None]
    controls = jnp.tile(jnp.asarray([[0.6, 0.0]]), (1, n, 1))
    t = jnp.linspace(0, cfg.traj_sim_time, n)
    ja = jnp.stack([0.4 * jnp.sin(t)] * 2 + [-0.3 * jnp.cos(t)] * 2,
                   axis=1)[None]
    states, forces = engine(z, controls, joint_angles=ja)
    print("final position:", np.asarray(states.x[0, -1]))
    print(plot_rollout_3d(np.asarray(z[0]), np.asarray(states.x[0]),
                          cfg.d_max, path=args.out))
    if args.animate:
        from monoforce_tpu.physics.engine import RigidState
        from monoforce_tpu.vis import animate_rollout
        one = RigidState(*(np.asarray(a)[0] for a in states))
        gif = args.out.rsplit(".", 1)[0] + ".gif"
        print(animate_rollout(np.asarray(z[0]), one,
                              robot_points=np.asarray(engine.robot.points),
                              forces=np.asarray(forces[0])[0],
                              d_max=float(cfg.d_max), path=gif))


def shoot(args):
    from monoforce_tpu.config import PhysicsConfig
    from monoforce_tpu.physics.controls import shooting_controls
    from monoforce_tpu.physics.engine import RobotModel
    from monoforce_tpu.physics.fast import fast_rollout
    from monoforce_tpu.planner.shooting import force_variance_cost
    from monoforce_tpu.vis import plot_terrain_with_trajs

    cfg = PhysicsConfig(robot="tradr")
    robot = RobotModel.from_config(cfg)
    z = jnp.asarray(make_terrain(cfg, args.terrain))
    controls, _ = shooting_controls(jax.random.PRNGKey(0), args.n_trajs,
                                    cfg.vel_max, cfg.omega_max,
                                    cfg.traj_sim_time, cfg.dt)

    @jax.jit
    def run(zg, c):
        states, stats = fast_rollout.__wrapped__(robot, zg, c)
        return states.x, force_variance_cost(stats.spring_std)

    xs, costs = run(z, controls)
    _ = np.asarray(costs)
    times = []
    for _i in range(args.repeats):
        t0 = time.perf_counter()
        xs, costs = run(z, controls)
        _ = np.asarray(costs)
        times.append(time.perf_counter() - t0)
    n_steps = controls.shape[1]
    print(f"{args.n_trajs} trajs x {n_steps} steps: "
          f"{min(times) * 1e3:.1f} ms (best of {args.repeats})")
    best = int(np.argmin(np.asarray(costs)))
    print("lowest-cost path:", best, float(costs[best]))
    print(plot_terrain_with_trajs(z, xs, costs, cfg.d_max, best=best,
                                  path=args.out))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("demo", choices=["motion", "shoot"])
    p.add_argument("--terrain", default="hill", choices=["hill", "step", "flat"])
    p.add_argument("--n_trajs", type=int, default=64)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--out", default="robot_control.png")
    p.add_argument("--animate", action="store_true",
                   help="also save a rollout GIF (the mayavi "
                        "animation's stand-in, dphysics.py:607-669)")
    args = p.parse_args()
    (motion if args.demo == "motion" else shoot)(args)


if __name__ == "__main__":
    main()
