"""TPU-optimized rollout path (the production hot loop).

Same step semantics as :mod:`monoforce_tpu.physics.engine` (the
reference-parity implementation), restructured for the hardware:

- **structure-of-arrays**: all per-contact-point quantities are (B, P)
  component planes instead of (B, P, 3) vectors, so VPU lanes are full
  (a last dim of 3 uses 3/128 lanes),
- **patch-based terrain lookup**: per step each trajectory extracts a 16x16
  window of the height/friction grids with ONE ``dynamic_slice`` (XLA lowers
  the batched form to an efficient gather-of-slices) and the four bilinear
  taps are pulled from the window with exact one-hot contractions on the
  MXU — profiled 300x faster than XLA's elementwise gather lowering for
  this workload,
- per-step cost statistics (for path costs) are reduced inside the scan, so
  (B, N, P, 3) force tensors never exist.

Equivalence to the exact path: in-bounds queries produce identical taps and
identical arithmetic (one-hot row selection is exact in f32); behavior
differs from the reference's flat-index clamp (dphysics.py:432-435) only for
queries outside the grid, where the reference wraps across rows.  The window
covers all robot points whenever the index span fits 15 cells (every robot
preset spans <= 11 cells including the +1 taps).

Flipper joint angles are not supported here (articulated marv rollouts use
the exact path); zero joint angles are semantically identical.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from monoforce_tpu.physics.engine import (
    RigidState, RobotModel, integrate_rotation, integration_step,
    _default_state0,
)

__all__ = ["fast_rollout", "StepStats"]

_HI = lax.Precision.HIGHEST
_PATCH = 16


class StepStats(NamedTuple):
    spring_std: jax.Array  # (B, N) std over points of |F_spring|
    abs_roll: jax.Array    # (B, N)
    abs_pitch: jax.Array   # (B, N)


def _patch_interp(z_grid, friction, qx, qy, d_max, grid_res):
    """Bilinear taps via window slices + one-hot contractions.

    z_grid/friction: (H, W) shared or (B, H, W) per-trajectory.
    qx, qy: (B, P) metric query coordinates.
    Returns z, (n_x, n_y, n_z), mu — each (B, P).
    """
    H, W = z_grid.shape[-2:]
    fx = (qx + d_max) / grid_res
    fy = (qy + d_max) / grid_res
    xi = fx.astype(jnp.int32)  # trunc toward zero (reference .long())
    yi = fy.astype(jnp.int32)
    xf = fx - xi
    yf = fy - yi

    # window min-corner per trajectory, clamped inside the grid
    sx = jnp.clip(jnp.min(xi, axis=1), 0, H - _PATCH)
    sy = jnp.clip(jnp.min(yi, axis=1), 0, W - _PATCH)
    xl = jnp.clip(xi - sx[:, None], 0, _PATCH - 2)
    yl = jnp.clip(yi - sy[:, None], 0, _PATCH - 2)

    if z_grid.ndim == 2:
        slice_fn = lambda s: lax.dynamic_slice(  # noqa: E731
            z_grid, (s[0], s[1]), (_PATCH, _PATCH))
        slice_fn_f = lambda s: lax.dynamic_slice(  # noqa: E731
            friction, (s[0], s[1]), (_PATCH, _PATCH))
        starts = jnp.stack([sx, sy], axis=1)
        pz = jax.vmap(slice_fn)(starts)
        pf = jax.vmap(slice_fn_f)(starts)
    else:
        starts = jnp.stack([sx, sy], axis=1)
        pz = jax.vmap(lambda g, s: lax.dynamic_slice(
            g, (s[0], s[1]), (_PATCH, _PATCH)))(z_grid, starts)
        pf = jax.vmap(lambda g, s: lax.dynamic_slice(
            g, (s[0], s[1]), (_PATCH, _PATCH)))(friction, starts)
    p2 = jnp.concatenate([pz, pf], axis=-1)                    # (B, 16, 32)

    oh_x0 = jax.nn.one_hot(xl, _PATCH, dtype=p2.dtype)
    oh_x1 = jax.nn.one_hot(xl + 1, _PATCH, dtype=p2.dtype)
    # row extraction is exact: each one-hot row has a single 1.0
    A0 = jnp.einsum("bph,bhw->bpw", oh_x0, p2, precision=_HI)  # rows at x_i
    A1 = jnp.einsum("bph,bhw->bpw", oh_x1, p2, precision=_HI)  # rows at x_i+1
    oh_y0 = jax.nn.one_hot(yl, _PATCH, dtype=p2.dtype)
    oh_y1 = jax.nn.one_hot(yl + 1, _PATCH, dtype=p2.dtype)

    z_c = (A0[..., :_PATCH] * oh_y0).sum(-1)
    z_f = (A1[..., :_PATCH] * oh_y0).sum(-1)
    z_l = (A0[..., :_PATCH] * oh_y1).sum(-1)
    z_fl = (A1[..., :_PATCH] * oh_y1).sum(-1)
    m_c = (A0[..., _PATCH:] * oh_y0).sum(-1)
    m_f = (A1[..., _PATCH:] * oh_y0).sum(-1)
    m_l = (A0[..., _PATCH:] * oh_y1).sum(-1)
    m_fl = (A1[..., _PATCH:] * oh_y1).sum(-1)

    # reference weight/tap pairing quirk (dphysics.py:442-445)
    w_cc = (1 - xf) * (1 - yf)
    w_cf = (1 - xf) * yf
    w_lc = xf * (1 - yf)
    w_fl = xf * yf
    z = w_cc * z_c + w_cf * z_f + w_lc * z_l + w_fl * z_fl
    mu = w_cc * m_c + w_cf * m_f + w_lc * m_l + w_fl * m_fl

    dz_dx = (z_f - z_c) / grid_res
    dz_dy = (z_l - z_c) / grid_res
    inv = lax.rsqrt(dz_dx * dz_dx + dz_dy * dz_dy + 1.0)
    return z, (-dz_dx * inv, -dz_dy * inv, inv), mu


def _fk_soa(robot: RobotModel, z_grid, friction, state: RigidState, tv):
    """forward_kinematics in structure-of-arrays form; tv: (B, K) track vels.

    Returns ((xd, xdd, omega_d), spring_mag (B, P)).
    """
    x, xd, R, omega = state
    m, g = robot.mass, robot.gravity
    px, py, pz = robot.points[:, 0], robot.points[:, 1], robot.points[:, 2]

    # world-frame points (B, P): p_w = R p_b + x
    rxx = R[:, 0, 0, None]; rxy = R[:, 0, 1, None]; rxz = R[:, 0, 2, None]
    ryx = R[:, 1, 0, None]; ryy = R[:, 1, 1, None]; ryz = R[:, 1, 2, None]
    rzx = R[:, 2, 0, None]; rzy = R[:, 2, 1, None]; rzz = R[:, 2, 2, None]
    wx = rxx * px + rxy * py + rxz * pz + x[:, 0, None]
    wy = ryx * px + ryy * py + ryz * pz + x[:, 1, None]
    wz = rzx * px + rzy * py + rzz * pz + x[:, 2, None]
    rx = wx - x[:, 0, None]; ry = wy - x[:, 1, None]; rz = wz - x[:, 2, None]

    # point velocities: v = xd + omega x r
    o0 = omega[:, 0, None]; o1 = omega[:, 1, None]; o2 = omega[:, 2, None]
    vx = xd[:, 0, None] + o1 * rz - o2 * ry
    vy = xd[:, 1, None] + o2 * rx - o0 * rz
    vz = xd[:, 2, None] + o0 * ry - o1 * rx

    z, (nx, ny, nz), mu = _patch_interp(z_grid, friction, wx, wy,
                                        robot.d_max, robot.grid_res)

    dh = wz - z
    contact = jax.nn.sigmoid(-10.0 * dh)
    vn = vx * nx + vy * ny + vz * nz
    scale = -(robot.stiffness * dh + robot.damping * vn)
    n_cp = jnp.sum(contact, axis=1, keepdims=True)
    cs = scale * contact / n_cp
    mg = m * g
    fsx = jnp.clip(cs * nx, -mg, mg)
    fsy = jnp.clip(cs * ny, -mg, mg)
    fsz = jnp.clip(cs * nz, -mg, mg)
    spring_mag = jnp.sqrt(fsx * fsx + fsy * fsy + fsz * fsz)

    # thrust direction = normalized first column of R
    tcol = R[:, :, 0]
    tnorm = jnp.clip(jnp.sqrt(jnp.sum(tcol * tcol, axis=1, keepdims=True)),
                     min=1e-6)
    t0 = (tcol[:, 0:1] / tnorm); t1 = (tcol[:, 1:2] / tnorm)
    t2 = (tcol[:, 2:3] / tnorm)
    cmd = jnp.matmul(tv, robot.driving_masks, precision=_HI)  # (B, P)
    sx_ = mu * (cmd * t0 - vx)
    sy_ = mu * (cmd * t1 - vy)
    sz_ = mu * (cmd * t2 - vz)
    sn = sx_ * nx + sy_ * ny + sz_ * nz
    ffx = jnp.clip(spring_mag * (sx_ - sn * nx), -mg, mg)
    ffy = jnp.clip(spring_mag * (sy_ - sn * ny), -mg, mg)
    ffz = jnp.clip(spring_mag * (sz_ - sn * nz), -mg, mg)

    fx_ = fsx + ffx; fy_ = fsy + ffy; fz_ = fsz + ffz
    tq0 = jnp.sum(ry * fz_ - rz * fy_, axis=1)
    tq1 = jnp.sum(rz * fx_ - rx * fz_, axis=1)
    tq2 = jnp.sum(rx * fy_ - ry * fx_, axis=1)
    torque = jnp.stack([tq0, tq1, tq2], axis=1)
    omega_d = jnp.clip(
        jnp.einsum("ij,bj->bi", robot.inertia_inv, torque, precision=_HI),
        -robot.omega_max, robot.omega_max)
    f_sum = jnp.stack([jnp.sum(fx_, 1), jnp.sum(fy_, 1), jnp.sum(fz_, 1)], 1)
    xdd = (m * g * robot.gravity_direction[None, :] + f_sum) / m
    return (xd, xdd, omega_d), spring_mag


@functools.partial(jax.jit, static_argnames=("with_stats",))
def fast_rollout(robot: RobotModel, z_grid, controls,
                 state0: Optional[RigidState] = None, friction=None,
                 track_vels=None, with_stats: bool = True):
    """Batched rollout on the fast path.

    Args:
      z_grid: (H, W) shared terrain or (B, H, W) per-trajectory terrain.
      controls: (B, N, 2) commanded (v, w).
      state0: optional initial state with (B, ...) leaves.
      friction: friction grid(s), same shape convention as z_grid; ones if
        None.
      track_vels: optional precomputed (B, N, K) track velocities (otherwise
        derived from controls).
      with_stats: also return per-step cost statistics.

    Returns (states: RigidState with (B, N, ...) leaves, StepStats | None).
    """
    controls = jnp.asarray(controls, jnp.float32)
    z_grid = jnp.asarray(z_grid, jnp.float32)
    if friction is None:
        friction = jnp.ones_like(z_grid)
    if state0 is None:
        state0 = _default_state0(controls)
    if track_vels is None:
        from monoforce_tpu.physics.controls import vw_to_track_vels
        track_vels = vw_to_track_vels(controls[..., 0], controls[..., 1],
                                      robot.robot_size, robot.n_tracks)
    B = controls.shape[0]

    # settle to mean terrain height under the body (dphysics.py:566-571)
    px, py, pz = robot.points[:, 0], robot.points[:, 1], robot.points[:, 2]
    R0 = state0.R
    wx = (R0[:, 0, 0, None] * px + R0[:, 0, 1, None] * py
          + R0[:, 0, 2, None] * pz + state0.x[:, 0, None])
    wy = (R0[:, 1, 0, None] * px + R0[:, 1, 1, None] * py
          + R0[:, 1, 2, None] * pz + state0.x[:, 1, None])
    z0, _, _ = _patch_interp(z_grid, friction, wx, wy,
                             robot.d_max, robot.grid_res)
    state0 = state0._replace(x=state0.x.at[:, 2].set(z0.mean(axis=1)))

    mode, dt = robot.integration_mode, robot.dt

    def step(state, tv_t):
        (xd, xdd, omega_d), spring_mag = _fk_soa(robot, z_grid, friction,
                                                 state, tv_t)
        xd_new = integration_step(state.xd, xdd, dt, mode)
        x_new = integration_step(state.x, xd_new, dt, mode)
        omega_new = integration_step(state.omega, omega_d, dt, mode)
        R_new = integrate_rotation(state.R, omega_new, dt)
        new_state = RigidState(x_new, xd_new, R_new, omega_new)
        out = [new_state]
        if with_stats:
            roll = jnp.arctan2(R_new[:, 2, 1], R_new[:, 2, 2])
            pitch = jnp.arctan2(
                -R_new[:, 2, 0],
                jnp.sqrt(R_new[:, 2, 1] ** 2 + R_new[:, 2, 2] ** 2))
            out.append((jnp.std(spring_mag, axis=1),
                        jnp.abs(roll), jnp.abs(pitch)))
        return new_state, tuple(out)

    _, outs = lax.scan(step, state0, jnp.swapaxes(track_vels, 0, 1))
    states = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), outs[0])

    # equilibrium sink-in compensation (dphysics.py:586-589)
    delta_h = robot.mass * robot.gravity / (robot.stiffness + 1e-6)
    states = states._replace(x=states.x + states.R[:, :, :, 2] * delta_h)

    stats = None
    if with_stats:
        s, r, p = outs[1]
        stats = StepStats(jnp.swapaxes(s, 0, 1), jnp.swapaxes(r, 0, 1),
                          jnp.swapaxes(p, 0, 1))
    return states, stats
