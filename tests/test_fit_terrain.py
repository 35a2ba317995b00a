"""Gradient-through-simulator terrain fitting (benchmark config #3) and
data-parallel sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RobotModel, rollout
from monoforce_tpu.training import fit_terrain
from monoforce_tpu.parallel import make_mesh, shard_batch, replicated


def _make_demo(cfg, key, B=4):
    """Simulate GT trajectories on a known gaussian hill."""
    gx, gy = cfg.grid_coords()
    z_true = (0.4 * np.exp(-((gx - 1.5) ** 2 / 2 + gy ** 2 / 3))).astype(np.float32)
    n = cfg.n_sim_steps
    v = np.linspace(0.5, 1.0, B, dtype=np.float32)
    w = np.linspace(-0.3, 0.3, B, dtype=np.float32)
    controls = jnp.asarray(np.stack(
        [np.tile([vv, ww], (n, 1)) for vv, ww in zip(v, w)]).astype(np.float32))
    robot = RobotModel.from_config(cfg)
    zb = jnp.broadcast_to(jnp.asarray(z_true), (B,) + z_true.shape)
    states_gt, _, _ = rollout(robot, zb, controls, return_forces=False)
    ts = jnp.tile(jnp.linspace(0, cfg.traj_sim_time, n)[None], (B, 1))
    return z_true, controls, states_gt, ts


def test_fit_terrain_converges():
    cfg = PhysicsConfig(robot="tradr", grid_res=0.4, traj_sim_time=1.0)
    z_true, controls, states_gt, ts = _make_demo(cfg, jax.random.PRNGKey(0))
    params, losses = fit_terrain(cfg, controls, [states_gt.x], ts, ts,
                                 n_iters=30)
    assert losses[-1] < losses[0] * 0.5, f"no convergence: {losses[0]} -> {losses[-1]}"
    assert np.isfinite(np.asarray(params.z_grid)).all()
    assert np.isfinite(np.asarray(params.friction)).all()


def test_fit_terrain_tv_regularization():
    """TV regularization is differentiable through the fit and changes the
    optimum; the optimization still makes progress."""
    cfg = PhysicsConfig(robot="tradr", grid_res=0.4, traj_sim_time=0.5)
    _, controls, states_gt, ts = _make_demo(cfg, jax.random.PRNGKey(1), B=2)
    p_no, l_no = fit_terrain(cfg, controls, [states_gt.x], ts, ts, n_iters=15)
    p_tv, l_tv = fit_terrain(cfg, controls, [states_gt.x], ts, ts, n_iters=15,
                             tv_weight=0.1)
    assert np.isfinite(l_tv).all()
    assert l_tv[-1] < l_tv[0]  # still converging with the extra term
    assert not np.allclose(np.asarray(p_no.z_grid), np.asarray(p_tv.z_grid))


def test_dp_fit_step_matches_single_device():
    """The data-parallel fit step over an 8-device mesh produces the same
    update as the single-device step (psum over ICI == serial sum)."""
    from monoforce_tpu.training.fit_terrain import (
        TerrainParams, make_optimizer, terrain_fit_step)
    cfg = PhysicsConfig(robot="tradr", grid_res=0.4, traj_sim_time=0.3)
    robot = RobotModel.from_config(cfg)
    _, controls, states_gt, ts = _make_demo(cfg, jax.random.PRNGKey(2), B=8)

    optimizer = make_optimizer()
    init = TerrainParams(z_grid=jnp.zeros(cfg.grid_shape),
                         friction=jnp.full(cfg.grid_shape, 0.5))

    # single device
    p1, s1, l1 = terrain_fit_step(init, optimizer.init(init), robot,
                                  controls, [states_gt.x], ts, ts, None,
                                  optimizer)

    # 8-device mesh
    mesh = make_mesh(8)
    batch = shard_batch({"c": controls, "x": states_gt.x, "ts": ts}, mesh)
    p_repl, s_repl = jax.device_put((init, optimizer.init(init)), replicated(mesh))
    p8, s8, l8 = terrain_fit_step(p_repl, s_repl, robot, batch["c"],
                                  [batch["x"]], batch["ts"], batch["ts"],
                                  None, optimizer)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1.z_grid), np.asarray(p8.z_grid),
                               atol=1e-5)


def test_graft_entry():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    xs, costs, best = out
    assert xs.shape == (32, 50, 3)
    assert costs.shape == (32,)
    assert 0 <= int(best) < 32
    g.dryrun_multichip(8)
