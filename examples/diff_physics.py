#!/usr/bin/env python
"""Differentiable-physics walkthrough (the reference's diff_physics.ipynb as
an executable script): build a terrain, sample controls, roll out a batch of
trajectories, cost them, and differentiate through the rollout.

Run: python examples/diff_physics.py
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics import DPhysics, generate_controls
from monoforce_tpu.physics.engine import RobotModel, rollout
from monoforce_tpu.physics.fast import fast_rollout
from monoforce_tpu.planner.shooting import force_variance_cost


def main():
    # 1. configuration: tracked robot, 12.8 m x 12.8 m grid at 0.1 m
    cfg = PhysicsConfig(robot="tradr")
    print(f"robot={cfg.robot}  mass={cfg.robot_mass} kg  "
          f"contact points={len(cfg.robot_points)}  grid={cfg.grid_shape}")

    # 2. terrain: a gaussian hill ahead of the robot
    gx, gy = cfg.grid_coords()
    z = 0.5 * np.exp(-((gx - 2.0) ** 2) / 2 - gy ** 2 / 4)
    z = jnp.asarray(z, jnp.float32)

    # 3. sample constant (v, w) control sequences for 64 trajectories
    controls, ts = generate_controls(jax.random.PRNGKey(0), n_trajs=64,
                                     time_horizon=5.0, dt=cfg.dt)

    # 4. exact engine: reference-parity API, returns forces too
    engine = DPhysics(cfg)
    states, (f_spring, f_friction) = engine(
        jnp.broadcast_to(z, (64,) + z.shape), controls)
    print("states:", states.x.shape, " spring forces:", f_spring.shape)

    # 5. fast path: the production hot loop with in-scan cost statistics
    robot = RobotModel.from_config(cfg)
    t0 = time.perf_counter()
    fstates, stats = fast_rollout(robot, z, controls)
    costs = np.asarray(force_variance_cost(stats.spring_std))
    print(f"fast path: {(time.perf_counter() - t0):.2f} s "
          f"(includes compile); best path {int(costs.argmin())} "
          f"cost {costs.min():.4f}")

    # 6. gradients THROUGH the simulator: d(final height)/d(terrain)
    def loss(zg):
        s, _ = fast_rollout(robot, zg, controls[:8])
        return jnp.mean(s.x[:, -1, 2])

    g = jax.grad(loss)(z)
    print(f"terrain gradient: shape {g.shape}, "
          f"nonzero cells {int((jnp.abs(g) > 0).sum())}")

    # 7. plot
    from monoforce_tpu.vis import plot_terrain_with_trajs
    out = plot_terrain_with_trajs(z, fstates.x, costs, cfg.d_max,
                                  best=int(costs.argmin()),
                                  path="diff_physics_example.png")
    print("saved", out)


if __name__ == "__main__":
    main()
