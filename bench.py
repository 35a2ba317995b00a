#!/usr/bin/env python
"""Headline benchmark: batched trajectory shooting on one TPU chip.

Workload (BASELINE.md config #2): 4096 parallel 100-step rollouts of the
tradr robot (~150 contact points) over a 128x128 heightmap, with per-step
path-cost statistics reduced in-scan (the online planner workload,
reference: monoforce_ros/nodes/monoforce_node.py:54-96 at 64 trajectories —
we run 64x that batch).

Target: < 10 ms per 4096x100 batch.  ``vs_baseline`` = target_ms / measured_ms
(values > 1 beat the target).

The batch is executed in chunks of ``CHUNK`` trajectories because XLA's
batched-gather lowering for the heightmap lookup falls off a cliff above
B~2048 on v5e; chunks are dispatched back-to-back and synchronized once.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RobotModel, rollout, _default_state0
from monoforce_tpu.planner.shooting import _step_stats, force_variance_cost

B_TOTAL = int(os.environ.get("BENCH_B", 4096))
N_STEPS = int(os.environ.get("BENCH_N", 100))
CHUNK = int(os.environ.get("BENCH_CHUNK", 1024))
TARGET_MS = 10.0
REPS = int(os.environ.get("BENCH_REPS", 10))


@jax.jit
def shoot_chunk(robot, zc, controls, state0):
    """One chunk of the shooting batch: states + in-scan cost statistics."""
    states, _, stats = rollout(robot, zc, controls, state0=state0,
                               return_forces=False, extras_fn=_step_stats)
    spring_std_t, _, _ = stats
    costs = force_variance_cost(spring_std_t)
    return states.x, costs


def main():
    cfg = PhysicsConfig(robot="tradr")
    robot = RobotModel.from_config(cfg)

    # gaussian-hill terrain, shared by all trajectories (materialized per
    # chunk once, outside the timed region — the planner reuses it across
    # planning ticks)
    gx, gy = cfg.grid_coords()
    z_np = 0.4 * np.exp(-((gx - 2.0) ** 2 / 4.0 + gy ** 2 / 8.0))
    zc = jnp.asarray(np.broadcast_to(z_np, (CHUNK,) + z_np.shape).copy(),
                     dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    controls = jax.random.uniform(key, (B_TOTAL, N_STEPS, 2),
                                  minval=-1.0, maxval=1.0)
    state0_full = _default_state0(controls)
    n_chunks = B_TOTAL // CHUNK
    chunks = [
        (controls[i * CHUNK:(i + 1) * CHUNK],
         jax.tree.map(lambda a: a[i * CHUNK:(i + 1) * CHUNK], state0_full))
        for i in range(n_chunks)
    ]

    def run_batch():
        outs = [shoot_chunk(robot, zc, c, s) for (c, s) in chunks]
        # synchronize on the (tiny) cost vectors; states stay on device
        return [np.asarray(costs) for (_, costs) in outs]

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
