"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RigidState, RobotModel
from monoforce_tpu.physics.fast import fast_rollout
from monoforce_tpu.parallel import (
    make_mesh, data_sharding, replicated, shard_batch, sharded_shoot,
)
from monoforce_tpu.planner.shooting import force_variance_cost


def test_make_mesh_and_sharding_helpers():
    mesh = make_mesh(8)
    assert mesh.size == 8
    batch = {"a": jnp.zeros((16, 4)), "b": jnp.zeros((16,))}
    sharded = shard_batch(batch, mesh)
    assert sharded["a"].sharding.spec[0] == "data"


def test_sharded_shoot_matches_single_device():
    cfg = PhysicsConfig(robot="tradr")
    robot = RobotModel.from_config(cfg)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(0)
    z = 0.1 * jax.random.normal(key, (128, 128))
    ctr = jax.random.uniform(key, (64, 50, 2), minval=-1, maxval=1)

    xs, costs = sharded_shoot(mesh, robot, z, ctr)
    assert xs.shape == (64, 50, 3)
    assert costs.shape == (64,)
    s, st = fast_rollout(robot, z, ctr)
    rmse = float(np.sqrt(np.mean((np.asarray(xs) - np.asarray(s.x)) ** 2)))
    assert rmse < 1e-3, rmse
    np.testing.assert_allclose(
        np.asarray(costs), np.asarray(force_variance_cost(st.spring_std)),
        atol=5e-3)


def test_sharded_shoot_with_state0_and_inclination():
    cfg = PhysicsConfig(robot="tradr")
    robot = RobotModel.from_config(cfg)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(1)
    z = jnp.zeros((128, 128))
    B = 16
    ctr = jnp.tile(jnp.asarray([[0.5, 0.2]]), (B, 40, 1))
    s0 = RigidState(jnp.zeros((B, 3)), jnp.zeros((B, 3)),
                    jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), jnp.zeros((B, 3)))
    xs, costs = sharded_shoot(mesh, robot, z, ctr, state0=s0,
                              cost="inclination")
    assert np.isfinite(np.asarray(costs)).all()
