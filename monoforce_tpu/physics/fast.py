"""TPU-optimized rollout path (the production hot loop).

Same step semantics as :mod:`monoforce_tpu.physics.engine` (the
reference-parity implementation), restructured for the hardware:

- **structure-of-arrays everywhere**: per-contact-point quantities are (B, P)
  component planes and the carried rigid-body state is eighteen (B,) scalar
  planes.  No (B, 3) or (B, 3, 3) tensors exist inside the scan — a last dim
  of 3 uses 3/128 VPU lanes and batched 3x3 matmuls lower catastrophically;
- **amortized terrain windows**: each trajectory's 16x16 height/friction
  window is extracted with a batched ``dynamic_slice`` only every
  ``REFRESH`` steps (a nested scan).  The robot moves well under one cell
  per step, so the window stays valid; profiling shows the varying-start
  slice-gather is ~5 ms/step at B=4096 on v5e, so amortizing it is the
  single biggest win;
- **exact one-hot tap extraction**: the four bilinear taps come from the
  window via one-hot contractions (single 1.0 per row — bit-exact row
  selection) on z and friction jointly (32-wide concat), replacing XLA's
  elementwise-gather lowering (~300x slower for this access pattern);
- **Rodrigues update in components**, expanded over the nine rotation
  entries;
- per-step cost statistics (for path costs) are reduced inside the scan, so
  (B, N, P, 3) force tensors never exist.

Equivalence to the exact path: in-bounds queries produce identical taps and
identical arithmetic; behavior differs from the reference's flat-index clamp
(dphysics.py:432-435) only for queries outside the grid or a stale window
(the window has >= 2 cells of margin and is refreshed every REFRESH=8 steps;
at |v| <= 2.5 m/s the drift between refreshes is under 2 cells).

Flipper joint angles are not supported here (articulated marv rollouts use
the exact path); zero joint angles are semantically identical.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from monoforce_tpu.physics.engine import RigidState, RobotModel, _default_state0

__all__ = ["fast_rollout", "fused_rollout", "StepStats"]

_HI = lax.Precision.HIGHEST
_PATCH = 16
_REFRESH = 8  # steps between window refreshes


class StepStats(NamedTuple):
    spring_std: jax.Array  # (B, N) std over points of |F_spring|
    abs_roll: jax.Array    # (B, N)
    abs_pitch: jax.Array   # (B, N)


def _extract_windows(z_grid, friction, qx, qy, d_max, grid_res):
    """Window min-corners from current query positions + (B, 512) row-major
    flattened [z(256) | friction(256)] patches.

    Windows are cut out with exact one-hot contractions on the MXU instead
    of batched ``dynamic_slice`` — XLA lowers varying-start slice batches to
    an elementwise gather that costs ~5 ms per call at B=4096 on v5e, while
    the two einsums below are <0.1 ms.  One-hot row/column selection is
    bit-exact (a single 1.0 per row).
    """
    H, W = z_grid.shape[-2:]
    B = qx.shape[0]
    xi = ((qx + d_max) / grid_res).astype(jnp.int32)
    yi = ((qy + d_max) / grid_res).astype(jnp.int32)
    # center the occupied span inside the window so both sides get margin
    sx = jnp.clip(jnp.min(xi, axis=1) - 2, 0, H - _PATCH)
    sy = jnp.clip(jnp.min(yi, axis=1) - 2, 0, W - _PATCH)

    rows = sx[:, None] + jnp.arange(_PATCH)          # (B, 16) absolute rows
    cols = sy[:, None] + jnp.arange(_PATCH)
    oh_rows = jax.nn.one_hot(rows, H, dtype=z_grid.dtype)   # (B, 16, H)
    oh_cols = jax.nn.one_hot(cols, W, dtype=z_grid.dtype)   # (B, 16, W)

    gg = jnp.concatenate([z_grid, friction], axis=-1)       # (.., H, 2W)
    if gg.ndim == 2:
        rows_sel = jnp.einsum("bkh,hw->bkw", oh_rows, gg, precision=_HI)
    else:
        rows_sel = jnp.einsum("bkh,bhw->bkw", oh_rows, gg, precision=_HI)
    pz = jnp.einsum("bkw,bcw->bkc", rows_sel[..., :W], oh_cols, precision=_HI)
    pf = jnp.einsum("bkw,bcw->bkc", rows_sel[..., W:], oh_cols, precision=_HI)
    patch_flat = jnp.concatenate(
        [pz.reshape(B, _PATCH * _PATCH), pf.reshape(B, _PATCH * _PATCH)],
        axis=-1)
    return sx, sy, patch_flat


def _window_interp(patch_flat, sx, sy, qx, qy, d_max, grid_res):
    """Bilinear taps out of cached windows.

    patch_flat: (B, 512) row-major flattened [z | friction] windows;
    sx, sy: (B,) window min-corners.  Returns z, (n_x, n_y, n_z), mu — each
    (B, P).  Tap gathering runs in a Pallas lane-gather kernel on TPU (exact
    value selection) with an XLA gather fallback elsewhere.
    """
    from monoforce_tpu.ops.interp_pallas import window_interp

    B, P = qx.shape
    fx = (qx + d_max) / grid_res
    fy = (qy + d_max) / grid_res
    xi = fx.astype(jnp.int32)  # trunc toward zero (reference .long())
    yi = fy.astype(jnp.int32)
    xf = fx - xi
    yf = fy - yi
    xl = jnp.clip(xi - sx[:, None], 0, _PATCH - 2)
    yl = jnp.clip(yi - sy[:, None], 0, _PATCH - 2)

    idx = xl * _PATCH + yl                      # (B, P) in [0, 238]
    pw = 128 * ((P + 127) // 128)               # minimal lane-register width
    pad = ((0, 0), (0, pw - P))
    out = window_interp(patch_flat, jnp.pad(idx, pad), jnp.pad(xf, pad),
                        jnp.pad(yf, pad),
                        jnp.reshape(grid_res, (1,)).astype(jnp.float32))
    out = out.reshape(B, 5, pw)[..., :P]
    return out[:, 0], (out[:, 1], out[:, 2], out[:, 3]), out[:, 4]


def _patch_interp(z_grid, friction, qx, qy, d_max, grid_res):
    """One-shot window extraction + interpolation (used for the settle)."""
    sx, sy, patch2 = _extract_windows(z_grid, friction, qx, qy, d_max, grid_res)
    return _window_interp(patch2, sx, sy, qx, qy, d_max, grid_res)


def _rodrigues_components(r, w0, w1, w2, dt, eps=1e-6):
    """R <- R expm([w]_x dt) expanded over the nine rotation entries.

    Matches engine.integrate_rotation exactly (same formula, component form).
    """
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = r
    theta = jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)
    inv_t = 1.0 / jnp.maximum(theta, eps)
    nx, ny, nz = w0 * inv_t, w1 * inv_t, w2 * inv_t
    s = jnp.sin(theta * dt)
    c1 = 1.0 - jnp.cos(theta * dt)
    m00 = 1.0 + c1 * (-(ny * ny + nz * nz))
    m01 = -nz * s + c1 * nx * ny
    m02 = ny * s + c1 * nx * nz
    m10 = nz * s + c1 * nx * ny
    m11 = 1.0 + c1 * (-(nx * nx + nz * nz))
    m12 = -nx * s + c1 * ny * nz
    m20 = -ny * s + c1 * nx * nz
    m21 = nx * s + c1 * ny * nz
    m22 = 1.0 + c1 * (-(nx * nx + ny * ny))
    return (
        r00 * m00 + r01 * m10 + r02 * m20,
        r00 * m01 + r01 * m11 + r02 * m21,
        r00 * m02 + r01 * m12 + r02 * m22,
        r10 * m00 + r11 * m10 + r12 * m20,
        r10 * m01 + r11 * m11 + r12 * m21,
        r10 * m02 + r11 * m12 + r12 * m22,
        r20 * m00 + r21 * m10 + r22 * m20,
        r20 * m01 + r21 * m11 + r22 * m21,
        r20 * m02 + r21 * m12 + r22 * m22,
    )


def _world_points(robot, st):
    """World-frame contact points (B, P) from the component state."""
    (x0, x1, x2, _, _, _, r00, r01, r02, r10, r11, r12,
     r20, r21, r22, _, _, _) = st
    px, py, pz = robot.points[:, 0], robot.points[:, 1], robot.points[:, 2]
    wx = r00[:, None] * px + r01[:, None] * py + r02[:, None] * pz + x0[:, None]
    wy = r10[:, None] * px + r11[:, None] * py + r12[:, None] * pz + x1[:, None]
    wz = r20[:, None] * px + r21[:, None] * py + r22[:, None] * pz + x2[:, None]
    return wx, wy, wz


def _fk_planes(robot: RobotModel, windows, st, tv):
    """forward_kinematics over component planes with cached windows.

    windows: (sx, sy, patch2) from _extract_windows.
    Returns (accelerations (ax,ay,az, aw0,aw1,aw2), spring_mag (B, P)).
    """
    (x0, x1, x2, v0, v1, v2,
     r00, r01, r02, r10, r11, r12, r20, r21, r22, w0, w1, w2) = st
    m, g = robot.mass, robot.gravity
    sx, sy, patch2 = windows

    wx, wy, wz = _world_points(robot, st)
    rx = wx - x0[:, None]; ry = wy - x1[:, None]; rz = wz - x2[:, None]

    vx = v0[:, None] + w1[:, None] * rz - w2[:, None] * ry
    vy = v1[:, None] + w2[:, None] * rx - w0[:, None] * rz
    vz = v2[:, None] + w0[:, None] * ry - w1[:, None] * rx

    z, (nx, ny, nz), mu = _window_interp(patch2, sx, sy, wx, wy,
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

    tn = lax.rsqrt(jnp.maximum(r00 * r00 + r10 * r10 + r20 * r20, 1e-12))
    t0 = (r00 * tn)[:, None]; t1 = (r10 * tn)[:, None]; t2 = (r20 * tn)[:, None]
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
    ii = robot.inertia_inv
    om = robot.omega_max
    aw0 = jnp.clip(ii[0, 0] * tq0 + ii[0, 1] * tq1 + ii[0, 2] * tq2, -om, om)
    aw1 = jnp.clip(ii[1, 0] * tq0 + ii[1, 1] * tq1 + ii[1, 2] * tq2, -om, om)
    aw2 = jnp.clip(ii[2, 0] * tq0 + ii[2, 1] * tq1 + ii[2, 2] * tq2, -om, om)
    gd = robot.gravity_direction
    ax = (m * g * gd[0] + jnp.sum(fx_, axis=1)) / m
    ay = (m * g * gd[1] + jnp.sum(fy_, axis=1)) / m
    az = (m * g * gd[2] + jnp.sum(fz_, axis=1)) / m
    return (ax, ay, az, aw0, aw1, aw2), spring_mag


def _unpack_state(state0: RigidState):
    x, xd, R, omega = state0
    return (x[:, 0], x[:, 1], x[:, 2], xd[:, 0], xd[:, 1], xd[:, 2],
            R[:, 0, 0], R[:, 0, 1], R[:, 0, 2],
            R[:, 1, 0], R[:, 1, 1], R[:, 1, 2],
            R[:, 2, 0], R[:, 2, 1], R[:, 2, 2],
            omega[:, 0], omega[:, 1], omega[:, 2])


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
    The trailing ``N mod REFRESH`` steps run in a remainder block so any N is
    supported.
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

    st = _unpack_state(state0)

    # settle to mean terrain height under the body (dphysics.py:566-571)
    wx, wy, _ = _world_points(robot, st)
    z0, _, _ = _patch_interp(z_grid, friction, wx, wy,
                             robot.d_max, robot.grid_res)
    st = st[:2] + (z0.mean(axis=1),) + st[3:]

    dt = robot.dt
    rk4 = robot.integration_mode == "rk4"

    def integ(a, da):
        if not rk4:
            return a + da * dt
        # reference 'rk4' formula (dphysics.py:375-380), scalar-plane form
        k1 = dt * da
        k2 = dt * (da + k1 / 2)
        k3 = dt * (da + k2 / 2)
        k4 = dt * (da + k3)
        return a + (k1 + 2 * k2 + 2 * k3 + k4) / 6

    def step(carry, tv_t):
        st, windows = carry
        acc, spring_mag = _fk_planes(robot, windows, st, tv_t)
        (x0, x1, x2, v0, v1, v2,
         r00, r01, r02, r10, r11, r12, r20, r21, r22, w0, w1, w2) = st
        # semi-implicit: velocity first, position with the new velocity
        v0n, v1n, v2n = integ(v0, acc[0]), integ(v1, acc[1]), integ(v2, acc[2])
        x0n, x1n, x2n = integ(x0, v0n), integ(x1, v1n), integ(x2, v2n)
        w0n, w1n, w2n = integ(w0, acc[3]), integ(w1, acc[4]), integ(w2, acc[5])
        r = _rodrigues_components(
            (r00, r01, r02, r10, r11, r12, r20, r21, r22), w0n, w1n, w2n, dt)
        new = (x0n, x1n, x2n, v0n, v1n, v2n) + r + (w0n, w1n, w2n)
        out = [new]
        if with_stats:
            roll = jnp.arctan2(r[7], r[8])
            pitch = jnp.arctan2(-r[6], jnp.sqrt(r[7] ** 2 + r[8] ** 2))
            out.append((jnp.std(spring_mag, axis=1),
                        jnp.abs(roll), jnp.abs(pitch)))
        return (new, windows), tuple(out)

    def run_block(st, tvs):
        """Refresh windows once, then scan over the block's steps."""
        wx, wy, _ = _world_points(robot, st)
        windows = _extract_windows(z_grid, friction, wx, wy,
                                   robot.d_max, robot.grid_res)
        (st, _), outs = lax.scan(step, (st, windows), tvs)
        return st, outs

    tv_t = jnp.swapaxes(track_vels, 0, 1)  # (N, B, K)
    n_total = tv_t.shape[0]
    n_blocks, rem = divmod(n_total, _REFRESH)

    outs_parts = []
    if n_blocks > 0:
        blocks = tv_t[:n_blocks * _REFRESH].reshape(
            (n_blocks, _REFRESH) + tv_t.shape[1:])
        st, outs_main = lax.scan(lambda s, b: run_block(s, b), st, blocks)
        # (n_blocks, REFRESH, ...) -> (N_main, ...)
        outs_main = jax.tree.map(
            lambda a: a.reshape((-1,) + a.shape[2:]), outs_main)
        outs_parts.append(outs_main)
    if rem > 0:
        st, outs_rem = run_block(st, tv_t[n_blocks * _REFRESH:])
        outs_parts.append(outs_rem)
    outs = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs_parts) \
        if len(outs_parts) > 1 else outs_parts[0]

    planes = outs[0]  # tuple of 18 arrays (N, B)
    xs = jnp.stack(planes[:3], axis=-1).swapaxes(0, 1)           # (B, N, 3)
    xds = jnp.stack(planes[3:6], axis=-1).swapaxes(0, 1)
    Rs = jnp.stack(planes[6:15], axis=-1).reshape(
        planes[6].shape + (3, 3)).swapaxes(0, 1)                 # (B, N, 3, 3)
    omegas = jnp.stack(planes[15:18], axis=-1).swapaxes(0, 1)

    # equilibrium sink-in compensation (dphysics.py:586-589)
    delta_h = robot.mass * robot.gravity / (robot.stiffness + 1e-6)
    xs = xs + Rs[..., :, 2] * delta_h
    states = RigidState(xs, xds, Rs, omegas)

    stats = None
    if with_stats:
        s, r_, p = outs[1]
        stats = StepStats(jnp.swapaxes(s, 0, 1), jnp.swapaxes(r_, 0, 1),
                          jnp.swapaxes(p, 0, 1))
    return states, stats


@functools.partial(jax.jit, static_argnames=())
def fused_rollout(robot: RobotModel, z_grid, controls,
                  state0: Optional[RigidState] = None, friction=None):
    """Rollout on the fully-fused block kernel (see physics/fused_block.py)
    — EXPERIMENTAL; measured equal to :func:`fast_rollout` on v5e (both are
    VPU/gather rooflined), retained as a development vehicle.

    Requirements (falls back to :func:`fast_rollout` otherwise): TPU backend,
    B a multiple of 512, <= 128 contact points, euler integration, default
    gravity direction, no flipper articulation.  Returns
    (states, StepStats) like ``fast_rollout(with_stats=True)``.
    """
    from monoforce_tpu.physics.fused_block import (
        BLOCK_STEPS, fused_block_steps,
    )
    from monoforce_tpu.physics.controls import vw_to_track_vels

    controls = jnp.asarray(controls, jnp.float32)
    z_grid = jnp.asarray(z_grid, jnp.float32)
    B, N = controls.shape[0], controls.shape[1]
    P = robot.points.shape[0]
    if (jax.default_backend() != "tpu" or B % 512 != 0 or P > 128
            or robot.integration_mode != "euler"):
        return fast_rollout.__wrapped__(robot, z_grid, controls,
                                        state0=state0, friction=friction)
    if friction is None:
        friction = jnp.ones_like(z_grid)
    if state0 is None:
        state0 = _default_state0(controls)

    # settle (same as fast_rollout)
    st = _unpack_state(state0)
    wx, wy, _ = _world_points(robot, st)
    z0, _, _ = _patch_interp(z_grid, friction, wx, wy,
                             robot.d_max, robot.grid_res)
    st = st[:2] + (z0.mean(axis=1),) + st[3:]
    state18 = jnp.stack(st, axis=1)                      # (B, 18)

    # constant inputs
    pad = 128 - P
    def padp(a):
        return jnp.pad(jnp.asarray(a, jnp.float32), (0, pad))
    mask = padp(jnp.ones((P,)))[None]                    # (1, 128)
    masks = robot.driving_masks                          # (K, P)
    if masks.shape[0] == 2:
        cmd_l, cmd_r = masks[0], masks[1]
    else:  # fl, fr, rl, rr with vl on left pair, vr on right pair
        cmd_l, cmd_r = masks[0] + masks[2], masks[1] + masks[3]
    pts = jnp.stack([padp(robot.points[:, 0]), padp(robot.points[:, 1]),
                     padp(robot.points[:, 2]), padp(cmd_l), padp(cmd_r),
                     jnp.zeros(128), jnp.zeros(128), jnp.zeros(128)])
    ii = robot.inertia_inv
    scal = jnp.stack([
        robot.mass, robot.gravity, robot.stiffness, robot.damping, robot.dt,
        robot.omega_max, robot.d_max, 1.0 / robot.grid_res,
        jnp.float32(P), ii[0, 0], ii[0, 1], ii[0, 2], ii[1, 1], ii[1, 2],
        ii[2, 2], jnp.float32(0.0),
    ])

    # (vl, vr) per step; front/rear pairs are identical for K=4
    tv = vw_to_track_vels(controls[..., 0], controls[..., 1],
                          robot.robot_size, 2)           # (B, N, 2)
    n_pad = (-N) % BLOCK_STEPS
    if n_pad:
        tv = jnp.concatenate([tv, jnp.repeat(tv[:, -1:], n_pad, axis=1)], 1)
    n_blocks = tv.shape[1] // BLOCK_STEPS
    tv_blocks = tv.reshape(B, n_blocks, BLOCK_STEPS * 2).transpose(1, 0, 2)

    H, W = z_grid.shape[-2:]

    def block(state18, tv_b):
        # window extraction at the block's starting positions (XLA side)
        stt = tuple(state18[:, j] for j in range(18))
        wx, wy, _ = _world_points(robot, stt)
        sx, sy, windows = _extract_windows(z_grid, friction, wx, wy,
                                           robot.d_max, robot.grid_res)
        sxy = jnp.stack([sx, sy], axis=1).astype(jnp.int32)
        new18, out = fused_block_steps(scal, windows, tv_b, state18, sxy,
                                       mask, pts)
        return new18, out

    _, outs = lax.scan(block, state18, tv_blocks)        # (nb, B, S*32)
    outs = outs.reshape(n_blocks, B, BLOCK_STEPS, 32)
    outs = outs.transpose(1, 0, 2, 3).reshape(B, n_blocks * BLOCK_STEPS, 32)
    outs = outs[:, :N]

    xs = outs[..., 0:3]
    xds = outs[..., 3:6]
    Rs = outs[..., 6:15].reshape(B, N, 3, 3)
    omegas = outs[..., 15:18]
    delta_h = robot.mass * robot.gravity / (robot.stiffness + 1e-6)
    xs = xs + Rs[..., :, 2] * delta_h
    states = RigidState(xs, xds, Rs, omegas)
    roll = jnp.arctan2(Rs[..., 2, 1], Rs[..., 2, 2])
    pitch = jnp.arctan2(-Rs[..., 2, 0],
                        jnp.sqrt(Rs[..., 2, 1] ** 2 + Rs[..., 2, 2] ** 2))
    stats = StepStats(outs[..., 18], jnp.abs(roll), jnp.abs(pitch))
    return states, stats
