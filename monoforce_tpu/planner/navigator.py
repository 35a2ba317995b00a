"""Closed-loop navigation: plan -> select -> follow -> simulate -> replan.

This is the integration the reference only exercises through Gazebo
(`monoforce_demos/launch/husky_gazebo_monoforce.launch`: the fused
terrain+physics node publishing sampled paths, `path_selector` arbitrating
against a waypoint route, `path_follower` emitting `cmd_vel`, and the
simulator closing the loop).  Here the differentiable engine IS the
simulator and the ROS topic graph becomes a host-side loop over jitted
programs:

    every ``replan_every`` seconds:
        sample shooting controls from the CURRENT state
        planner_rollout on the terrain estimate -> paths + costs
        WaypointRoute.select (waypoint distance + path cost arbitration)
    every ``control_dt`` seconds:
        FollowerController.tick(pose, selected path) -> (v, w, status)
            [the supervisor wraps the pure control law with the reference
             path_follower's 10 Hz loop logic (:475-626): clearance-box
             obstacle check at the carrot, stop -> force-through on
             timeout, idle backtracking]
        advance the simulator (exact engine semantics) by control_dt

All array programs keep fixed shapes, so each compiles once and the loop
runs at serving rates (each tick is one planner batch + one 1-trajectory
engine segment).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monoforce_tpu.physics.controls import shooting_controls
from monoforce_tpu.physics.engine import RigidState, RobotModel
from monoforce_tpu.physics.fast import fast_rollout, planner_rollout
from monoforce_tpu.planner.controller import FollowerController
from monoforce_tpu.planner.follower import FollowerParams
from monoforce_tpu.planner.selector import WaypointRoute
from monoforce_tpu.planner.shooting import (
    force_variance_cost, inclination_cost,
)

__all__ = ["NavigationResult", "navigate"]


class NavigationResult(NamedTuple):
    reached: bool            # route completed before the timeout
    positions: np.ndarray    # (T, 3) simulated robot positions
    commands: np.ndarray     # (T, 2) follower (v, w) commands
    times: np.ndarray        # (T,)
    plans: list              # [(t, paths (B, N, 3), costs (B,), best)]
    # supervisor status per tick ('follow', 'waiting', 'force_through',
    # 'backtrack', 'idle', 'done').  Default is an (immutable) empty tuple —
    # a `[]` default on a NamedTuple is CLASS-level shared state.
    statuses: Sequence[str] = ()


def _pose_from_state(state: RigidState) -> jnp.ndarray:
    T = jnp.eye(4)
    T = T.at[:3, :3].set(state.R[0])
    T = T.at[:3, 3].set(state.x[0])
    return T


def navigate(cfg, z_grid, waypoints, state0: Optional[RigidState] = None,
             friction=None, z_true=None, friction_true=None,
             n_trajs: int = 32, plan_horizon: float = 2.0,
             replan_every: float = 0.5, control_dt: float = 0.1,
             max_time: float = 40.0, cost: str = "force_variance",
             follower_params: FollowerParams = FollowerParams(),
             waypoint_weight: float = 1.0, path_weight: float = 1.0,
             obstacles=None, controller: Optional[FollowerController] = None,
             key=None, verbose: bool = False) -> NavigationResult:
    """Drive the robot along ``waypoints`` over ``z_grid``.

    Args:
      cfg: PhysicsConfig (``PhysicsConfig.for_planner`` recommended — the
        planning batch then runs the pair-packed serving kernel).
      z_grid / friction: the terrain ESTIMATE the planner sees (H, W).
      z_true / friction_true: the simulator's ground-truth terrain;
        defaults to the estimate (perfect-perception setting).
      waypoints: (K, 3) route in the terrain frame.
      state0: initial RigidState with (1, ...) leaves; origin default.
      n_trajs / plan_horizon: shooting batch per replan.
      replan_every / control_dt: planner and follower tick periods.
      cost: 'force_variance' (monoforce_node.py:91) or 'inclination'
        (diff_physics.py:262-266).
      obstacles: optional (M, 3) obstacle cloud in the terrain frame.  When
        given, every tick runs the supervisor's clearance-box check at the
        carrot pose (reference path_follower:282-302 inside its 10 Hz loop
        :475-626): an obstructed carrot stops the robot ('waiting'), and
        after ``controller.force_through_after`` seconds it proceeds at the
        reduced force-through speed cap (:532-547).
      controller: optional pre-configured FollowerController (timeouts,
        backtracking parameters); a default one wrapping
        ``follower_params`` is created if None.

    Returns a NavigationResult (positions at every control tick, plus the
    supervisor status per tick).
    """
    robot = RobotModel.from_config(cfg)
    z_grid = jnp.asarray(z_grid, jnp.float32)
    z_true = z_grid if z_true is None else jnp.asarray(z_true, jnp.float32)
    if friction is None:
        friction = jnp.full(z_grid.shape, cfg.friction_coef, jnp.float32)
    friction_true = friction if friction_true is None else friction_true
    route = WaypointRoute(waypoints)
    key = key if key is not None else jax.random.PRNGKey(0)

    if state0 is None:
        eye = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        state0 = RigidState(jnp.zeros((1, 3)), jnp.zeros((1, 3)), eye,
                            jnp.zeros((1, 3)))
    state = state0

    if controller is None:
        controller = FollowerController(follower_params)
    obstacles = (jnp.asarray(obstacles, jnp.float32)
                 if obstacles is not None else None)

    n_sim = max(1, int(round(control_dt / cfg.dt)))
    positions, commands, times, plans, statuses = [], [], [], [], []
    t = 0.0
    reached = False
    while t < max_time:
        robot_xyz = np.asarray(state.x[0])
        if route.update(robot_xyz) is None:
            reached = True
            break

        if controller.path is None or (len(times) % max(1, int(round(
                replan_every / control_dt)))) == 0:
            key, sub = jax.random.split(key)
            controls, _ = shooting_controls(
                sub, n_trajs, cfg.vel_max, cfg.omega_max, plan_horizon,
                cfg.dt)
            plan_state = RigidState(*[jnp.broadcast_to(a, (n_trajs,)
                                                       + a.shape[1:])
                                      for a in state])
            states, stats = planner_rollout(robot, z_grid, controls,
                                            state0=plan_state,
                                            friction=friction)
            if cost == "force_variance":
                costs = force_variance_cost(stats.spring_std)
            else:
                costs = inclination_cost(stats.abs_roll, stats.abs_pitch)
            best, trunc = route.select(states.x, costs, robot_xyz,
                                       waypoint_weight, path_weight)
            path = states.x[best]
            if trunc is not None:
                # lookahead truncation keeps a fixed shape by repeating the
                # truncation point (path_selector:255-258 semantics)
                M = path.shape[0]
                idx = jnp.minimum(jnp.arange(M), trunc)
                path = path[idx]
            plans.append((t, np.asarray(states.x), np.asarray(costs), best))
            controller.set_path(path)

        v, w, status = controller.tick(np.asarray(_pose_from_state(state)),
                                       t, cloud=obstacles)
        statuses.append(status)
        sim_controls = jnp.full((1, n_sim, 2), 0.0).at[..., 0].set(v) \
                                                   .at[..., 1].set(w)
        sim_states, _ = fast_rollout(robot, z_true[None], sim_controls,
                                     state0=state, friction=friction_true[None],
                                     with_stats=False)
        state = RigidState(*[a[:, -1] for a in sim_states])

        positions.append(np.asarray(state.x[0]))
        commands.append((v, w))
        times.append(t)
        t += control_dt
        if verbose and len(times) % 10 == 0:
            print(f"t={t:5.1f}s  pos={positions[-1][:2].round(2)}  "
                  f"wp={route.wp_i}/{len(route.waypoints)}")

    return NavigationResult(reached, np.asarray(positions),
                            np.asarray(commands), np.asarray(times), plans,
                            statuses)
