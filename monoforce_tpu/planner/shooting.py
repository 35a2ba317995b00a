"""Trajectory shooting planner: sampled controls -> rollouts -> path costs ->
path selection.

This is the TPU-native re-design of the reference's online planning stack —
the ROS nodes' *logic* without ROS:

- cost functions: force-variance (monoforce_ros/nodes/monoforce_node.py:91)
  and inclination (monoforce_ros/nodes/diff_physics.py:262-266),
- the shooting driver (monoforce_node.predict_paths, diff_physics
  DPhysEngine.predict_paths) as one fused jitted program — per-step cost
  statistics are reduced INSIDE the rollout scan (``extras_fn``), so the
  (B, N, P, 3) force tensors never hit HBM,
- waypoint/path-cost arbitration (monoforce_navigation/nodes/
  path_selector:249-251).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from monoforce_tpu.physics.engine import RigidState, RobotModel
from monoforce_tpu.physics.controls import shooting_controls

__all__ = [
    "Planner", "PlanResult", "force_variance_cost", "inclination_cost",
    "select_path", "normalize_costs", "roll_pitch",
]


def roll_pitch(R):
    """Roll/pitch Euler angles from rotation matrices (..., 3, 3)
    (reference: transformations.py:50-57 rot2rpy)."""
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    pitch = jnp.arctan2(-R[..., 2, 0],
                        jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2))
    return roll, pitch


def _step_stats(state: RigidState, forces):
    """Per-step scalars reduced inside the scan: spring-force-norm std over
    contact points, |roll|, |pitch|."""
    f_spring, _ = forces
    spring_std = jnp.std(jnp.linalg.norm(f_spring, axis=-1))
    r, p = roll_pitch(state.R)
    return spring_std, jnp.abs(r), jnp.abs(p)


def force_variance_cost(spring_std_t):
    """std over time of the per-step spring-norm std (B, N) -> (B,)
    (reference: monoforce_node.py:91 ``norm(F).std(points).std(time)``)."""
    return jnp.std(spring_std_t, axis=-1)


def inclination_cost(abs_roll_t, abs_pitch_t):
    """mean |roll| + mean |pitch| over time (B, N) -> (B,)
    (reference: diff_physics.py:262-266)."""
    return jnp.mean(abs_roll_t, axis=-1) + jnp.mean(abs_pitch_t, axis=-1)


def normalize_costs(x, eps: float = 1e-6):
    """Scale to [0, 1] over the path batch (reference: utils.py:43-57 with
    qlow=0, qhigh=1 as used by path_selector:249)."""
    x_min, x_max = jnp.min(x), jnp.max(x)
    return jnp.clip((x - x_min) / jnp.maximum(x_max - x_min, eps), 0.0, 1.0)


def select_path(path_costs, path_dists_to_wp=None,
                waypoint_weight: float = 1.0, path_weight: float = 1.0):
    """Arbitrate sampled paths against a waypoint objective
    (reference: path_selector:249-251).

    Returns (selected_index, combined_costs).
    """
    combined = path_weight * normalize_costs(path_costs)
    if path_dists_to_wp is not None:
        combined = combined + waypoint_weight * normalize_costs(path_dists_to_wp)
    return jnp.argmin(combined), combined


class PlanResult(NamedTuple):
    xs: jax.Array          # (B, N, 3) positions
    Rs: jax.Array          # (B, N, 3, 3) rotations
    costs: jax.Array       # (B,) per-path cost
    best: jax.Array        # () index of the lowest-cost path


@functools.partial(jax.jit, static_argnames=("cost",))
def _plan(robot: RobotModel, z_grid, friction, controls, state0, cost: str):
    # forward-only shooting: the serving-grade planner rollout (fused
    # per-point step kernel; trajectory-pair packing for P <= 64 presets)
    from monoforce_tpu.physics.fast import planner_rollout
    states, stats = planner_rollout.__wrapped__(
        robot, z_grid, controls, state0=state0, friction=friction)
    if cost == "force_variance":
        costs = force_variance_cost(stats.spring_std)
    elif cost == "inclination":
        costs = inclination_cost(stats.abs_roll, stats.abs_pitch)
    else:
        raise ValueError(f"unknown cost {cost!r}")
    return PlanResult(states.x, states.R, costs, jnp.argmin(costs))


class Planner:
    """Shooting planner over one terrain estimate.

    Equivalent of the fused online node (monoforce_ros/nodes/
    monoforce_node.py:54-96): repeat the terrain across ``n_sim_trajs``
    sampled control sequences, roll out, cost, pick the best.
    """

    def __init__(self, cfg, cost: str = "force_variance"):
        self.cfg = cfg
        self.cost = cost
        self.robot = RobotModel.from_config(cfg)

    def sample_controls(self, key):
        controls, ts = shooting_controls(
            key, self.cfg.n_sim_trajs, self.cfg.vel_max, self.cfg.omega_max,
            self.cfg.traj_sim_time, self.cfg.dt)
        return controls, ts

    def plan(self, z_grid, controls, state0: Optional[RigidState] = None,
             friction=None) -> PlanResult:
        """z_grid: (H, W) terrain; controls: (B, N, 2); state0 with (B, ...)
        leaves (e.g. the robot pose replicated across the batch)."""
        z_grid = jnp.asarray(z_grid, jnp.float32)
        if friction is None:
            friction = jnp.full(z_grid.shape[-2:], self.cfg.friction_coef,
                                dtype=jnp.float32)
        return _plan(self.robot, z_grid, friction, controls, state0, self.cost)
