"""Planner tests: shooting costs, selection, follower control law."""

import jax
import jax.numpy as jnp
import numpy as np

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.planner import (
    Planner, FollowerParams, follower_step, normalize_costs, select_path,
)
from monoforce_tpu.planner.shooting import inclination_cost, force_variance_cost
import pytest


def small_cfg():
    return PhysicsConfig(robot="tradr", traj_sim_time=1.5, n_sim_trajs=16)


def test_planner_flat_vs_rough():
    cfg = small_cfg()
    planner = Planner(cfg, cost="force_variance")
    controls, _ = planner.sample_controls(jax.random.PRNGKey(0))
    flat = jnp.zeros(cfg.grid_shape)
    rng = np.random.default_rng(0)
    rough = jnp.asarray(rng.normal(scale=0.15, size=cfg.grid_shape).astype(np.float32))
    res_flat = planner.plan(flat, controls)
    res_rough = planner.plan(rough, controls)
    assert res_flat.xs.shape == (16, controls.shape[1], 3)
    assert res_flat.costs.shape == (16,)
    # rough terrain produces higher force variance on average
    assert float(res_rough.costs.mean()) > float(res_flat.costs.mean())
    assert 0 <= int(res_flat.best) < 16


@pytest.mark.smoke
def test_inclination_cost_prefers_flat_path():
    cfg = small_cfg()
    planner = Planner(cfg, cost="inclination")
    # terrain sloped only for x > 0: backward paths stay flat
    gx, _ = cfg.grid_coords()
    z = jnp.asarray((0.4 * np.clip(gx, 0, None)).astype(np.float32))
    n = int(cfg.traj_sim_time / cfg.dt)
    controls = jnp.stack([
        jnp.tile(jnp.asarray([[1.0, 0.0]]), (n, 1)),    # forward, uphill
        jnp.tile(jnp.asarray([[-1.0, 0.0]]), (n, 1)),   # backward, flat
    ])
    res = planner.plan(z, controls)
    assert int(res.best) == 1


@pytest.mark.smoke
def test_cost_functions_shapes():
    B, N = 4, 20
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))
    assert force_variance_cost(s).shape == (B,)
    assert inclination_cost(s, s).shape == (B,)


@pytest.mark.smoke
def test_normalize_and_select():
    costs = jnp.asarray([3.0, 1.0, 2.0])
    n = np.asarray(normalize_costs(costs))
    np.testing.assert_allclose(n, [1.0, 0.0, 0.5], atol=1e-6)
    # waypoint distance dominates with large weight
    dists = jnp.asarray([0.0, 5.0, 10.0])
    idx, combined = select_path(costs, dists, waypoint_weight=10.0, path_weight=1.0)
    assert int(idx) == 0
    # pure path cost
    idx, _ = select_path(costs, None)
    assert int(idx) == 1


def test_follower_drives_toward_path():
    path = jnp.stack([jnp.linspace(0, 5, 50),
                      jnp.zeros(50), jnp.zeros(50)], axis=-1)
    pose = jnp.eye(4)
    cmd = follower_step(pose, path)
    assert float(cmd.linear) > 0
    assert abs(float(cmd.angular)) < 0.2
    assert not bool(cmd.goal_reached)

    # goal to the left -> positive yaw command
    pose_l = jnp.eye(4).at[:3, :3].set(jnp.asarray(
        [[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]))  # facing -y
    cmd_l = follower_step(pose_l, path)
    assert float(cmd_l.angular) > 0.2


def test_follower_goal_reached_and_backward():
    path = jnp.stack([jnp.linspace(0, 5, 50), jnp.zeros(50), jnp.zeros(50)], -1)
    pose_goal = jnp.eye(4).at[0, 3].set(5.0)
    cmd = follower_step(pose_goal, path)
    assert bool(cmd.goal_reached)
    assert float(cmd.linear) == 0.0

    # path behind the robot -> backward drive when allowed
    pose_ahead = jnp.eye(4).at[0, 3].set(7.0)
    cmd_b = follower_step(pose_ahead, path, FollowerParams(allow_backward=True))
    assert float(cmd_b.linear) < 0
    cmd_f = follower_step(pose_ahead, path, FollowerParams(allow_backward=False))
    assert float(cmd_f.linear) >= 0


def test_follower_inclination_slowdown():
    path = jnp.stack([jnp.linspace(0, 5, 50), jnp.zeros(50), jnp.zeros(50)], -1)
    pose = jnp.eye(4)
    a = 0.4  # pitched up
    pitched = pose.at[:3, :3].set(jnp.asarray(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]))
    v_flat = float(follower_step(pose, path).linear)
    v_pitch = float(follower_step(pitched, path).linear)
    assert v_pitch < v_flat
