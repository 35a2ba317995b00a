"""Loss-function tests."""

import jax.numpy as jnp
import numpy as np

import pytest

from monoforce_tpu.losses import (
    hm_loss, physics_loss, rotation_difference, translation_difference,
    total_variation, slerp,
)



# whole module is part of the fast pre-commit smoke tier
pytestmark = pytest.mark.smoke

def test_hm_loss_zero_for_identical():
    h = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 16, 16)).astype(np.float32))
    assert float(hm_loss(h, h)) == 0.0


def test_hm_loss_weights_and_nan_mask():
    gt = jnp.zeros((1, 1, 4, 4))
    pred = jnp.ones((1, 1, 4, 4))
    # full weights -> MSE 1
    assert float(hm_loss(pred, gt)) == 1.0
    # zero weights on half the cells -> only weighted cells contribute (but
    # the mean still runs over all valid cells, like the reference)
    w = jnp.concatenate([jnp.ones((1, 1, 2, 4)), jnp.zeros((1, 1, 2, 4))], axis=2)
    assert float(hm_loss(pred, gt, weights=w)) == 0.5
    # NaNs in gt are excluded entirely
    gt_nan = gt.at[0, 0, 0, :].set(jnp.nan)
    v = float(hm_loss(pred, gt_nan))
    assert abs(v - 1.0) < 1e-6


def test_hm_loss_h_max_squash():
    gt = jnp.zeros((1, 1, 2, 2))
    pred = jnp.full((1, 1, 2, 2), 100.0)
    v = float(hm_loss(pred, gt, h_max=2.0))
    assert abs(v - 4.0) < 1e-4  # tanh saturates at 2.0 -> MSE 4


def test_physics_loss_alignment_and_discount():
    # pred at dt=0.01 (500 steps), gt at 10 Hz (50 stamps)
    N, T1, T2 = 2, 100, 10
    pred_ts = jnp.tile(jnp.linspace(0, 1, T1)[None], (N, 1))
    gt_ts = jnp.tile(jnp.linspace(0, 1, T2)[None], (N, 1))
    X_pred = jnp.zeros((N, T1, 3)).at[:, :, 0].set(pred_ts)
    X_gt = jnp.zeros((N, T2, 3)).at[:, :, 0].set(gt_ts)
    loss = physics_loss([X_pred], [X_gt], pred_ts, gt_ts)
    assert float(loss) < 1e-5  # perfectly aligned trajectories

    # shifting the prediction raises the loss
    loss2 = physics_loss([X_pred + 0.5], [X_gt], pred_ts, gt_ts)
    assert float(loss2) > float(loss)

    # early errors weigh more than late ones (w = 1/(1+gamma t))
    X_early = X_pred.at[:, :10, 1].add(1.0)
    X_late = X_pred.at[:, -10:, 1].add(1.0)
    l_early = physics_loss([X_early], [X_gt], pred_ts, gt_ts)
    l_late = physics_loss([X_late], [X_gt], pred_ts, gt_ts)
    assert float(l_early) >= float(l_late)


def test_physics_loss_rotation():
    N, T = 1, 5
    ts = jnp.tile(jnp.linspace(0, 1, T)[None], (N, 1))
    X = jnp.zeros((N, T, 3))
    R_id = jnp.broadcast_to(jnp.eye(3), (N, T, 3, 3))
    a = 0.3
    R_rot = jnp.broadcast_to(jnp.asarray(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
    ), (N, T, 3, 3))
    loss, loss_rot = physics_loss([X, None, R_rot], [X, None, R_id], ts, ts,
                                  rotation_loss=True)
    assert float(loss) < 1e-6
    assert float(loss_rot) > 0


def test_rotation_difference_known_angle():
    a = 0.5
    R1 = jnp.asarray([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                      [0, 0, 1]], jnp.float32)[None]
    R2 = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    v = float(rotation_difference(R1, R2))
    np.testing.assert_allclose(v, a ** 2, rtol=1e-4)


def test_translation_difference():
    x1 = jnp.zeros((4, 3))
    x2 = jnp.ones((4, 3))
    np.testing.assert_allclose(float(translation_difference(x1, x2)),
                               np.sqrt(3), rtol=1e-6)


def test_total_variation():
    flat = jnp.zeros((8, 8))
    assert float(total_variation(flat)) == 0.0
    ramp = jnp.tile(jnp.arange(8.0)[None], (8, 1))
    assert float(total_variation(ramp)) > 0


def test_slerp_endpoints_and_norm():
    q1 = jnp.asarray([1.0, 0, 0, 0])
    a = 0.8
    q2 = jnp.asarray([np.cos(a / 2), 0, 0, np.sin(a / 2)], dtype=jnp.float32)
    t = jnp.linspace(0, 1, 5)
    q = slerp(q1, q2, t)
    np.testing.assert_allclose(np.asarray(q[0]), q1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q[-1]), q2, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
    # near-parallel falls back to lerp without NaN
    q_close = slerp(q1, jnp.asarray([0.99999994, 0, 0, 3e-4]), t)
    assert np.isfinite(np.asarray(q_close)).all()
