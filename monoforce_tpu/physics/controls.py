"""Control sampling and track-velocity kinematics.

Reference parity: generate_controls (dphysics.py:42-72) and vw_to_track_vels
(dphysics.py:75-104), rebuilt on jax.random (stateless keys instead of the
torch global RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["generate_controls", "vw_to_track_vels", "time_stamps", "shooting_controls"]


def time_stamps(time_horizon: float = 5.0, dt: float = 0.01):
    """linspace(0, T, int(T/dt)) like the reference's `ts` (dphysics.py:60,167)."""
    n = int(time_horizon / dt)
    return jnp.linspace(0.0, time_horizon, n)


def generate_controls(key, n_trajs: int = 10,
                      time_horizon: float = 5.0, dt: float = 0.01,
                      v_range=(-1.0, 1.0), w_range=(-1.0, 1.0)):
    """Sample constant (v, w) command sequences for trajectory shooting.

    Returns controls (n_trajs, N, 2) and stamps (N,) with N = int(T/dt).
    """
    n = int(time_horizon / dt)
    kv, kw = jax.random.split(key)
    v = jax.random.uniform(kv, (n_trajs,), minval=v_range[0], maxval=v_range[1])
    w = jax.random.uniform(kw, (n_trajs,), minval=w_range[0], maxval=w_range[1])
    controls = jnp.stack([v, w], axis=-1)[:, None, :] * jnp.ones((1, n, 1))
    return controls, time_stamps(time_horizon, dt)


def shooting_controls(key, n_trajs: int, vel_max: float, omega_max: float,
                      time_horizon: float = 5.0, dt: float = 0.01):
    """Front/back split shooting controls like the online planner
    (monoforce_ros/nodes/monoforce_node.py:43-53): half the trajectories drive
    forward with v in [vel_max/2, vel_max], half backward in
    [-vel_max, -vel_max/2]; yaw rate in [-omega_max, omega_max]."""
    kf, kb = jax.random.split(key)
    front, _ = generate_controls(kf, n_trajs // 2, time_horizon, dt,
                                 v_range=(vel_max / 2, vel_max),
                                 w_range=(-omega_max, omega_max))
    back, ts = generate_controls(kb, n_trajs - n_trajs // 2, time_horizon, dt,
                                 v_range=(-vel_max, -vel_max / 2),
                                 w_range=(-omega_max, omega_max))
    return jnp.concatenate([front, back], axis=0), ts


def vw_to_track_vels(v, w, robot_size, n_tracks: int):
    """(v, w) twist -> per-track linear velocities.

    For 2 tracks: [left, right]; for 4: [fl, fr, rl, rr] (front/rear pairs
    identical, differential drive).  ``v``/``w`` may carry leading batch dims.
    """
    _, Ly = robot_size[0], robot_size[1]
    v_l = v - w * (Ly / 2.0)
    v_r = v + w * (Ly / 2.0)
    if n_tracks == 2:
        return jnp.stack([v_l, v_r], axis=-1)
    if n_tracks == 4:
        return jnp.stack([v_l, v_r, v_l, v_r], axis=-1)
    raise ValueError("n_tracks must be 2 or 4")
