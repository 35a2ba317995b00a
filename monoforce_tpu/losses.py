"""Training losses.

Reference parity: monoforce/src/monoforce/losses.py — weighted masked MSE
heightmap loss, time-discounted trajectory MSE with timestamp alignment,
geodesic rotation loss, total variation, slerp.  All are pure jnp functions;
NaN masking is fixed-shape (``jnp.where`` + valid-count normalization instead
of boolean indexing, which would create dynamic shapes under jit).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "hm_loss",
    "physics_loss",
    "rotation_difference",
    "translation_difference",
    "total_variation",
    "slerp",
]


def translation_difference(x1, x2, reduction: str = "mean"):
    """Norm of pairwise translation error (reference: losses.py:36-45)."""
    d = jnp.linalg.norm(x1 - x2, axis=-1)
    if reduction == "mean":
        return d.mean()
    if reduction == "sum":
        return d.sum()
    return d


def rotation_difference(R1, R2, reduction: str = "mean"):
    """Squared geodesic angle between rotations (reference: losses.py:48-65)."""
    dR = jnp.matmul(R1, jnp.swapaxes(R2, -2, -1))
    tr = jnp.trace(dR, axis1=-2, axis2=-1)[..., None]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos) ** 2
    if reduction == "mean":
        return theta.mean()
    if reduction == "sum":
        return theta.sum()
    return theta


def total_variation(heightmap):
    """Mean absolute first differences along both axes (losses.py:68-74)."""
    h, w = heightmap.shape[-2], heightmap.shape[-1]
    tv = (jnp.sum(jnp.abs(heightmap[..., :, :-1] - heightmap[..., :, 1:]))
          + jnp.sum(jnp.abs(heightmap[..., :-1, :] - heightmap[..., 1:, :])))
    return tv / (h * w)


def hm_loss(height_pred, height_gt, weights=None, h_max=None):
    """Weighted masked MSE between heightmaps (reference: losses.py:77-99).

    NaN cells in either map are excluded from the mean (fixed-shape masking).
    If ``h_max`` is given, predictions are squashed to [-h_max, h_max] with
    tanh first.
    """
    if weights is None:
        weights = jnp.ones_like(height_gt)
    if h_max is not None:
        height_pred = h_max * jnp.tanh(height_pred)
    valid = ~(jnp.isnan(height_pred) | jnp.isnan(height_gt))
    pred = jnp.where(valid, height_pred, 0.0) * weights
    gt = jnp.where(valid, height_gt, 0.0) * weights
    n_valid = jnp.maximum(valid.sum(), 1)
    return jnp.sum(jnp.where(valid, (pred - gt) ** 2, 0.0)) / n_valid


def physics_loss(states_pred, states_gt, pred_ts, gt_ts, gamma: float = 0.9,
                 rotation_loss: bool = False):
    """Time-discounted trajectory MSE with timestamp alignment
    (reference: losses.py:102-138).

    Args:
      states_pred / states_gt: sequences whose first element is positions
        (N, T, 3) (and third element rotations (N, T, 3, 3) if
        ``rotation_loss``).
      pred_ts: (N, T1) prediction timestamps.
      gt_ts: (N, T2) ground-truth timestamps.
      gamma: time-discount factor, weights w = 1 / (1 + gamma * t).
    """
    X_gt = states_gt[0]
    X_pred = states_pred[0]

    # nearest predicted step for every ground-truth timestamp
    ts_ids = jnp.argmin(jnp.abs(pred_ts[:, None, :] - gt_ts[:, :, None]), axis=2)
    batch = jnp.arange(X_gt.shape[0])[:, None]
    X_pred_aligned = X_pred[batch, ts_ids]

    time_weights = 1.0 / (1.0 + gamma * gt_ts[..., None])
    loss = jnp.mean((X_pred_aligned * time_weights - X_gt * time_weights) ** 2)

    if rotation_loss:
        R_gt = states_gt[2]
        R_pred_aligned = states_pred[2][batch, ts_ids]
        loss_rot = rotation_difference(R_pred_aligned, R_gt, reduction="none")
        loss_rot = (loss_rot * time_weights).mean()
        return loss, loss_rot
    return loss


def slerp(q1, q2, t, diff_thresh: float = 0.9995):
    """Spherical quaternion interpolation (reference: losses.py:14-34), with
    the near-parallel branch handled by ``jnp.where`` (fixed-shape).

    q1, q2: (4,) unit quaternions; t: (T,) interpolation fractions.
    Returns (T, 4).
    """
    dot = jnp.sum(q1 * q2)
    # linear branch
    lin = q1[None, :] + t[:, None] * (q2 - q1)[None, :]
    lin = lin / jnp.linalg.norm(lin, axis=-1, keepdims=True)
    # spherical branch
    theta_0 = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta_0 = jnp.sin(theta_0)
    theta = theta_0 * t
    s0 = jnp.cos(theta) - dot * jnp.sin(theta) / jnp.maximum(sin_theta_0, 1e-12)
    s1 = jnp.sin(theta) / jnp.maximum(sin_theta_0, 1e-12)
    sph = s0[:, None] * q1[None, :] + s1[:, None] * q2[None, :]
    sph = sph / jnp.linalg.norm(sph, axis=-1, keepdims=True)
    return jnp.where(dot > diff_thresh, lin, sph)
