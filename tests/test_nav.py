"""Navigation supervisor tests: waypoint route, controller modes,
time-cost, clearance, heightmap inpainting, locked CSV."""

import jax.numpy as jnp
import numpy as np

from monoforce_tpu.planner import (
    FollowerController, FollowerParams, WaypointRoute, path_time_cost,
    pose_clear, select_against_route,
)
from monoforce_tpu.ops.heightmap import inpaint_heightmap, local_heightmap
from monoforce_tpu.utils import append_to_csv, write_to_csv
import pytest


def _straight_paths():
    t = np.linspace(0, 1, 20, dtype=np.float32)
    fwd = np.stack([5 * t, 0 * t, 0 * t], -1)
    left = np.stack([3 * t, 3 * t, 0 * t], -1)
    back = np.stack([-4 * t, 0 * t, 0 * t], -1)
    return jnp.asarray(np.stack([fwd, left, back]))


@pytest.mark.smoke
def test_select_against_route_prefers_waypoint_direction():
    paths = _straight_paths()
    costs = jnp.asarray([0.5, 0.5, 0.5])  # equal intrinsic cost
    best, combined, trunc = select_against_route(
        paths, costs, jnp.asarray([3.0, 3.0, 0.0]))
    assert int(best) == 1  # the left path ends at the waypoint
    assert trunc is not None


@pytest.mark.smoke
def test_select_respects_path_cost_weight():
    paths = _straight_paths()
    costs = jnp.asarray([0.0, 10.0, 5.0])
    best, _, _ = select_against_route(paths, costs, jnp.asarray([3.0, 3.0, 0.0]),
                                      waypoint_weight=0.0, path_weight=1.0)
    assert int(best) == 0
    # waypoint_weight=0 -> no truncation
    _, _, trunc = select_against_route(paths, costs,
                                       jnp.asarray([3.0, 3.0, 0.0]),
                                       waypoint_weight=0.0)
    assert trunc is None


@pytest.mark.smoke
def test_waypoint_route_progression():
    route = WaypointRoute([[1.0, 0, 0], [2.0, 0, 0], [5.0, 0, 0]],
                          reach_dist=0.5)
    assert np.allclose(route.update([0.0, 0, 0]), [1, 0, 0])
    # robot reaches wp0 -> advance to wp1
    assert np.allclose(route.update([0.9, 0.0, 0]), [2, 0, 0])
    # robot near wp1 and wp2 still far
    assert np.allclose(route.update([1.8, 0, 0]), [5, 0, 0])
    assert not route.done
    route.update([4.9, 0, 0])
    assert route.done and route.current is None


def test_follower_controller_modes():
    ctl = FollowerController(force_through_after=1.0, backtrack_after=2.0)
    path = np.stack([np.linspace(0, 5, 30), np.zeros(30), np.zeros(30)], -1)
    pose = np.eye(4, dtype=np.float32)

    # no path yet -> idle
    v, w, status = ctl.tick(pose, t=0.0)
    assert status == "idle" and v == 0.0

    ctl.set_path(path)
    v, w, status = ctl.tick(pose, t=0.1)
    assert status == "follow" and v > 0

    # obstacle at the carrot -> waiting, then force_through after timeout
    cloud = np.tile(np.array([[1.0, 0.0, 0.2]], np.float32), (20, 1))
    v, w, status = ctl.tick(pose, t=0.2, cloud=cloud)
    assert status == "waiting" and v == 0.0
    v, w, status = ctl.tick(pose, t=2.0, cloud=cloud)
    assert status == "force_through"
    assert 0 < v <= ctl.max_force_through_speed + 1e-6

    # goal reached
    pose_goal = np.eye(4, dtype=np.float32)
    pose_goal[0, 3] = 5.0
    v, w, status = ctl.tick(pose_goal, t=3.0)
    assert status == "done"

    # idle long enough with traversed history -> backtrack
    for i, x in enumerate(np.linspace(0, 3, 10)):
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = x
        ctl.tick(p, t=4.0 + i * 0.01)
    v, w, status = ctl.tick(p, t=30.0)
    assert status == "backtrack"
    assert v != 0.0 or w != 0.0


def test_path_time_cost_monotone():
    path = jnp.stack([jnp.linspace(0, 5, 20), jnp.zeros(20), jnp.zeros(20)], -1)
    c = path_time_cost(path, max_speed=1.0)
    assert float(c[0]) == 0.0
    assert np.all(np.diff(np.asarray(c)) >= 0)
    np.testing.assert_allclose(float(c[-1]), 5.0, rtol=1e-5)
    # inclination raises the cost
    a = 0.4
    Rp = jnp.asarray([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], jnp.float32)
    Rs = jnp.broadcast_to(Rp, (20, 3, 3))
    c2 = path_time_cost(path, Rs=Rs, max_speed=1.0)
    assert float(c2[-1]) > float(c[-1])


def test_pose_clear():
    pose = jnp.eye(4)
    far = jnp.ones((50, 3)) * 5.0
    assert bool(pose_clear(far, pose))
    near = jnp.zeros((50, 3)) + jnp.asarray([0.1, 0.0, 0.1])
    assert not bool(pose_clear(near, pose))


def test_inpaint_and_local_heightmap():
    rng = np.random.default_rng(0)
    hm = np.zeros((32, 32), np.float32)
    hm[8:12, 8:12] = 1.0
    mask = np.zeros((32, 32), np.float32)
    mask[8:12, 8:12] = 1.0
    mask[20:24, 20:24] = 1.0
    filled = np.asarray(inpaint_heightmap(hm, mask, iters=40))
    assert np.isfinite(filled).all()
    assert filled[10, 10] == 1.0           # measured cells unchanged
    assert 0.0 <= filled[15, 15] <= 1.0    # gap filled between regions

    cloud = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    cloud[:, 2] = 0.3
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [1.0, 2.0, 0.0]
    lm = np.asarray(local_heightmap(cloud, pose, 0.1, 3.2, 2.0))
    assert lm.shape == (64, 64)
    assert abs(np.nanmedian(lm) - 0.3) < 0.05


def test_locked_csv(tmp_path):
    p = str(tmp_path / "out.csv")
    write_to_csv(p, "a,b", [[1, 2], [3, 4]])
    append_to_csv(p, [[5, 6]])
    lines = open(p).read().strip().split("\n")
    assert lines == ["a,b", "1,2", "3,4", "5,6"]


def test_prefetch_loader_matches_plain():
    from monoforce_tpu.utils import NumpyLoader, PrefetchLoader

    class DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return (np.full((2, 2), i, np.float32),)

    plain = list(NumpyLoader(DS(), batch_size=2))
    pre = list(PrefetchLoader(NumpyLoader(DS(), batch_size=2)))
    assert len(plain) == len(pre) == 4
    for a, b in zip(plain, pre):
        np.testing.assert_allclose(a[0], b[0])


@pytest.mark.smoke
def test_gridmap_roundtrip_and_start_indices():
    from monoforce_tpu.gridmap import (
        GridMapData, gridmap_to_heightmap, heightmap_to_gridmap,
        heightmap_to_cloud_points,
    )
    rng = np.random.default_rng(5)
    hm = rng.normal(size=(16, 16)).astype(np.float32)
    mask = (rng.uniform(size=(16, 16)) > 0.5).astype(np.float32)

    gm = heightmap_to_gridmap(hm, 0.1, mask=mask)
    assert gm.length_x == gm.length_y == 1.6
    back = gridmap_to_heightmap(gm)
    np.testing.assert_allclose(back, hm)
    np.testing.assert_allclose(gridmap_to_heightmap(gm, "mask"), mask)

    # circular-buffer start indices are undone (ros.py:247-254)
    shifted = GridMapData(resolution=gm.resolution, length_x=gm.length_x,
                          length_y=gm.length_y,
                          layers={"elevation": np.roll(
                              np.roll(gm.layers["elevation"], 3, axis=1),
                              5, axis=0)},
                          outer_start_index=3, inner_start_index=5)
    np.testing.assert_allclose(gridmap_to_heightmap(shifted), hm)

    pts = heightmap_to_cloud_points(hm, 0.1, xyz=np.array([1.0, 2.0, 0.0]))
    assert pts.shape == (256, 3)
    np.testing.assert_allclose(pts[:, 2].mean(), hm.mean(), atol=1e-5)


def test_closed_loop_navigation_with_obstruction():
    """The supervisor runs INSIDE the closed loop (reference path_follower
    runs its clearance / stuck / force-through logic inside the 10 Hz
    control loop, path_follower:475-626): an obstacle cloud on the route
    obstructs the carrot -> the robot stops ('waiting'), force-through
    engages after the timeout at the reduced speed cap, and the route still
    completes."""
    import jax.numpy as jnp

    from monoforce_tpu.config import PhysicsConfig
    from monoforce_tpu.planner.navigator import navigate

    cfg = PhysicsConfig.for_planner("tradr")
    z = jnp.zeros(cfg.grid_shape, jnp.float32)
    rng = np.random.default_rng(3)
    obstacles = (np.array([[1.1, 0.0, 0.1]], np.float32)
                 + rng.normal(scale=0.05, size=(30, 3)).astype(np.float32))
    ctl = FollowerController(FollowerParams(), force_through_after=0.5)
    res = navigate(cfg, z, waypoints=np.asarray([[2.8, 0.0, 0.0]]),
                   n_trajs=8, plan_horizon=1.5, max_time=30.0,
                   obstacles=obstacles, controller=ctl)
    assert "waiting" in res.statuses          # the obstruction stopped it
    assert "force_through" in res.statuses    # then it pushed through
    assert res.reached, (res.positions[-1], res.statuses[-5:])
    # while waiting the robot stood still; while forcing through it crept
    waiting = [i for i, s in enumerate(res.statuses) if s == "waiting"]
    assert all(abs(res.commands[i][0]) < 1e-6 for i in waiting)
    forcing = [i for i, s in enumerate(res.statuses) if s == "force_through"]
    assert all(abs(res.commands[i][0]) <= ctl.max_force_through_speed + 1e-6
               for i in forcing)


def test_closed_loop_navigation():
    """The full L2-L8 loop (plan -> select -> follow -> simulate -> replan)
    reaches a waypoint on smooth terrain — the integration the reference
    only exercises through its Gazebo launch stack
    (husky_gazebo_monoforce.launch)."""
    import jax.numpy as jnp

    from monoforce_tpu.config import PhysicsConfig
    from monoforce_tpu.planner.navigator import navigate

    cfg = PhysicsConfig.for_planner("tradr")
    gx, gy = cfg.grid_coords()
    z = jnp.asarray((0.15 * np.exp(-((gx - 2.0) ** 2 + gy ** 2) / 3.0))
                    .astype(np.float32))
    res = navigate(cfg, z, waypoints=np.asarray([[2.5, 1.0, 0.0]]),
                   n_trajs=8, plan_horizon=1.5, max_time=25.0)
    assert res.reached, res.positions[-1]
    assert len(res.plans) >= 2                 # it replanned along the way
    assert np.isfinite(res.positions).all()
    # the follower actually drove (not teleported): bounded per-tick motion
    steps = np.linalg.norm(np.diff(res.positions[:, :2], axis=0), axis=-1)
    assert steps.max() < cfg.vel_max * 0.1 * 1.5
