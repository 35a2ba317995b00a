"""Path-follower control law as a pure function.

Re-implements the carrot-chasing P-controller of the reference follower node
(reference: monoforce_navigation/nodes/path_follower:475-626) without ROS:

- nearest path point within look-ahead, carrot advanced along the path until
  the accumulated arc length reaches the look-ahead distance (:498-528),
- heading P-control with clamped angular rate, speed ramp that vanishes when
  turning on the spot (:588-617),
- roll/pitch slow-down: speed /= (1 + |roll|/max_roll + |pitch|/max_pitch)
  (:466-473, :607),
- optional backward driving when the goal is behind (:588-592),
- goal-reached detection at the final path point (:575-585).

The kd-tree of the reference is replaced by a vectorized argmin over the path
points — paths here are short (N<=500) and this keeps the function jittable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["FollowerParams", "FollowerCommand", "follower_step"]


class FollowerParams(NamedTuple):
    look_ahead: float = 1.0          # carrot distance [m]
    max_speed: float = 1.0           # [m/s]
    max_angular_rate: float = 1.0    # [rad/s]
    turn_on_spot_angle: float = 1.0  # [rad] heading error that zeroes speed
    p_angle: float = 1.5             # heading P gain
    p_dist: float = 1.5              # speed P gain
    max_roll: float = 0.5            # [rad]
    max_pitch: float = 0.5           # [rad]
    goal_reached_dist: float = 0.3   # [m]
    allow_backward: bool = True


class FollowerCommand(NamedTuple):
    linear: jnp.ndarray    # () commanded forward speed
    angular: jnp.ndarray   # () commanded yaw rate
    goal_reached: jnp.ndarray  # () bool
    carrot: jnp.ndarray    # (3,) look-ahead point in the path frame


def follower_step(pose, path, params: FollowerParams = FollowerParams()):
    """One 10 Hz control tick.

    Args:
      pose: (4, 4) robot pose in the path frame.
      path: (M, 3) path points in the same frame.
      params: controller gains/limits.

    Returns a FollowerCommand.
    """
    pos = pose[:3, 3]
    R = pose[:3, :3]

    # nearest path point, then advance the carrot by accumulated arc length
    d = jnp.linalg.norm(path - pos[None, :], axis=-1)
    i0 = jnp.argmin(d)
    seg = jnp.linalg.norm(jnp.diff(path, axis=0), axis=-1)
    seg = jnp.concatenate([jnp.zeros(1, dtype=seg.dtype), seg])
    arc = jnp.cumsum(seg)
    # arc length from the nearest point; carrot = first point at >= look_ahead
    rel = arc - arc[i0]
    reachable = (jnp.arange(path.shape[0]) >= i0)
    past_la = reachable & (rel >= params.look_ahead)
    last = path.shape[0] - 1
    carrot_i = jnp.where(past_la.any(), jnp.argmax(past_la), last)
    goal = path[carrot_i]

    # goal in the robot frame
    local = R.T @ (goal - pos)
    dist = jnp.linalg.norm(local)
    angle = jnp.arctan2(local[1], local[0])

    # drive backward if the carrot is behind and allowed (:588-592)
    backward = params.allow_backward & (jnp.abs(angle) > jnp.pi / 2)
    angle = jnp.where(backward,
                      jnp.mod(angle + jnp.pi / 2, jnp.pi) - jnp.pi / 2, angle)
    vel_sign = jnp.where(backward, -1.0, 1.0)

    angular = jnp.clip(params.p_angle * angle,
                       -params.max_angular_rate, params.max_angular_rate)

    # speed: P on distance, quadratic ramp-down with heading error (:601)
    gain = params.p_dist * jnp.maximum(
        0.0, 1.0 - (jnp.abs(angle) / params.turn_on_spot_angle) ** 2)
    speed = gain * dist

    # inclination slow-down (:466-473, :607)
    roll = jnp.arctan2(R[2, 1], R[2, 2])
    pitch = jnp.arctan2(-R[2, 0], jnp.sqrt(R[2, 1] ** 2 + R[2, 2] ** 2))
    pose_cost = jnp.abs(roll) / params.max_roll + jnp.abs(pitch) / params.max_pitch
    speed = speed / (1.0 + pose_cost)
    speed = vel_sign * jnp.clip(speed, 0.0, params.max_speed)

    reached = (carrot_i == last) & (dist <= params.goal_reached_dist)
    speed = jnp.where(reached, 0.0, speed)
    angular = jnp.where(reached, 0.0, angular)
    return FollowerCommand(speed, angular, reached, goal)
