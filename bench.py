#!/usr/bin/env python
"""Headline benchmark: batched trajectory shooting on one TPU chip.

Workload (BASELINE.md config #2): 4096 parallel 100-step rollouts of the
tradr robot (~150 contact points) over a 128x128 heightmap, with per-step
path-cost statistics reduced in-scan (the online planner workload,
reference: monoforce_ros/nodes/monoforce_node.py:54-96 at 64 trajectories —
we run 64x that batch).

Target: < 10 ms per 4096x100 batch.  ``vs_baseline`` = target_ms / measured_ms
(values > 1 beat the target).

Runs on the fast rollout path (monoforce_tpu.physics.fast): SoA vector math
plus window-slice + one-hot-contraction terrain lookups, which replace XLA's
elementwise-gather lowering (~300x slower on v5e for this access pattern).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RobotModel
from monoforce_tpu.planner.shooting import force_variance_cost

B_TOTAL = int(os.environ.get("BENCH_B", 4096))
N_STEPS = int(os.environ.get("BENCH_N", 100))
TARGET_MS = 10.0
REPS = int(os.environ.get("BENCH_REPS", 10))


@jax.jit
def shoot(robot, z_grid, controls):
    """Shooting batch on the fast path: states + in-scan cost statistics."""
    from monoforce_tpu.physics.fast import fast_rollout
    states, stats = fast_rollout.__wrapped__(robot, z_grid, controls)
    costs = force_variance_cost(stats.spring_std)
    return states.x, costs


def main():
    cfg = PhysicsConfig(robot="tradr")
    robot = RobotModel.from_config(cfg)

    # gaussian-hill terrain shared across the shooting batch (the online
    # planner's workload shape, monoforce_node.py:54-96)
    gx, gy = cfg.grid_coords()
    z_np = 0.4 * np.exp(-((gx - 2.0) ** 2 / 4.0 + gy ** 2 / 8.0))
    z = jnp.asarray(z_np, dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    controls = jax.random.uniform(key, (B_TOTAL, N_STEPS, 2),
                                  minval=-1.0, maxval=1.0)

    def run_batch():
        _, costs = shoot(robot, z, controls)
        # synchronize on the (tiny) cost vector; states stay on device
        return np.asarray(costs)

    run_batch()  # compile + warmup
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        run_batch()
        times.append(time.perf_counter() - t0)
    ms = float(np.min(times) * 1e3)

    print(json.dumps({
        "metric": f"shooting_rollout_{B_TOTAL}x{N_STEPS}_latency",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
