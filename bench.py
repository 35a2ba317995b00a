#!/usr/bin/env python
"""Headline benchmark: batched trajectory shooting on one TPU chip.

Workload (BASELINE.md config #2): 4096 parallel 100-step rollouts of the
tradr robot (~150 contact points) over a 128x128 heightmap, with per-step
path-cost statistics reduced in-scan (the online planner workload,
reference: monoforce_ros/nodes/monoforce_node.py:54-96 at 64 trajectories —
we run 64x that batch).

Target: < 10 ms per 4096x100 batch.  ``vs_baseline`` = target_ms / measured_ms
(values > 1 beat the target).

Measures SUSTAINED latency: ``REPS`` consecutive shooting batches inside one
jitted program (the continuous-planning serving pattern), one host sync at
the end.  This removes the host/tunnel dispatch floor (~30 ms on the axon
test harness) from the per-batch figure; the single-shot latency is the
sustained figure plus that floor.

Runs on the fast rollout path (monoforce_tpu.physics.fast): SoA component
planes, one-hot MXU window extraction, amortized window refresh, and a
Pallas lane-gather kernel for the bilinear taps.  History on v5e:
naive XLA gathers 8046 ms -> fast path v1 1080 ms -> amortized windows
362 ms -> Pallas taps 175 ms -> one-hot windows 62 ms single-shot;
sustained 23 ms with single-register contact presets.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RobotModel
from monoforce_tpu.physics.fast import fast_rollout
from monoforce_tpu.planner.shooting import force_variance_cost

B_TOTAL = int(os.environ.get("BENCH_B", 4096))
N_STEPS = int(os.environ.get("BENCH_N", 100))
TARGET_MS = 10.0
REPS = int(os.environ.get("BENCH_REPS", 10))
OUTER = int(os.environ.get("BENCH_OUTER", 3))


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

    @jax.jit
    def shoot_many(zg, ctr):
        def body(acc, i):
            # perturb controls per repeat so no work can be hoisted
            states, stats = fast_rollout.__wrapped__(robot, zg,
                                                     ctr + i * 1e-4)
            costs = force_variance_cost(stats.spring_std)
            return acc + costs.sum(), ()
        return lax.scan(body, 0.0, jnp.arange(REPS))[0]

    np.asarray(shoot_many(z, controls))  # compile + warmup
    times = []
    for _ in range(OUTER):
        t0 = time.perf_counter()
        np.asarray(shoot_many(z, controls))
        times.append(time.perf_counter() - t0)
    ms = float(np.min(times) * 1e3 / REPS)

    print(json.dumps({
        "metric": f"shooting_rollout_{B_TOTAL}x{N_STEPS}_sustained_latency",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
