"""Fully-fused rollout block kernel (Pallas) — EXPERIMENTAL.

Measured outcome (v5e, 4096x100): ~24 ms sustained — the same as the
default fast path.  The boundary-materialization hypothesis did not hold:
the per-step physics math itself is VPU-bound (~120 plane ops/step) and the
lane gathers add ~4K cycles/step/program, so fusing steps into one kernel
moves the cost without removing it.  Kept as a verified starting point for
future work (trajectory RMSE vs the fast path: 1.4e-5; cost-statistic
divergence only at contact-transition chaos).  Going below ~20 ms needs op
-count reduction or bf16 math (a parity trade), not more fusion.

This kernel runs EIGHT physics steps per invocation entirely in VMEM — world points, terrain taps
(lane gathers), contact/friction forces, torque, semi-implicit integration
and the componentwise Rodrigues update — so only the compact per-step state
planes and cost statistics cross the boundary, once per 8-step block.

Same step semantics as physics/fast.py (which remains the reference for
this kernel in tests); zero-joint robots only, euler integration.

Layout per program (RB = 512 trajectories as sublane rows):
- windows   (RB, 512)  [z(256) | friction(256)] flattened 16x16 patches
- tv        (RB, 2*S)  per-step left/right track velocities (S = steps)
- state io  (RB, 18)   [x(3) xd(3) R(9) w(3)]
- mask      (1, 128)   valid-point lanes (P <= 128)
- pts       (8, 128)   body-frame point components [px py pz pad...] +
                       cmd-mask rows
- scal      (1, 16) SMEM: m, g, k, b, dt, omega_max, d_max, inv_res,
                       sx_off... (see _SCAL)
- out       (RB, S*32) packed per-step planes:
                       [x(3) v(3) R(9) w(3) spring_std]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monoforce_tpu.ops.interp_pallas import TAP_OFFSETS, _gather128

__all__ = ["fused_block_steps", "BLOCK_STEPS"]

BLOCK_STEPS = 8
_RB = 512
_PATCH = 16


def _kernel(scal_ref, win_ref, tv_ref, st_ref, sxy_ref, mask_ref, pts_ref,
            newst_ref, out_ref):
    m = scal_ref[0]
    g = scal_ref[1]
    stiff = scal_ref[2]
    damp = scal_ref[3]
    dt = scal_ref[4]
    om_max = scal_ref[5]
    d_max = scal_ref[6]
    inv_res = scal_ref[7]
    n_pts = scal_ref[8]

    win = win_ref[:]                 # (RB, 512)
    mask = mask_ref[0:1, :]          # (1, 128)
    px = pts_ref[0:1, :]             # body points, broadcast over rows
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    cmd_l = pts_ref[3:4, :]          # left-track membership (already split
    cmd_r = pts_ref[4:5, :]          # per half for K=4 too: fl+rl / fr+rr)
    sx = sxy_ref[:, 0:1].astype(jnp.float32)   # window corners (RB, 1)
    sy = sxy_ref[:, 1:2].astype(jnp.float32)

    st = st_ref[:]                   # (RB, 18)
    x0 = st[:, 0:1]; x1 = st[:, 1:2]; x2 = st[:, 2:3]
    v0 = st[:, 3:4]; v1 = st[:, 4:5]; v2 = st[:, 5:6]
    r00 = st[:, 6:7]; r01 = st[:, 7:8]; r02 = st[:, 8:9]
    r10 = st[:, 9:10]; r11 = st[:, 10:11]; r12 = st[:, 11:12]
    r20 = st[:, 12:13]; r21 = st[:, 13:14]; r22 = st[:, 14:15]
    w0 = st[:, 15:16]; w1 = st[:, 16:17]; w2 = st[:, 17:18]

    state = (x0, x1, x2, v0, v1, v2, r00, r01, r02, r10, r11, r12,
             r20, r21, r22, w0, w1, w2)

    def step(s, t):
        (x0, x1, x2, v0, v1, v2, r00, r01, r02, r10, r11, r12,
         r20, r21, r22, w0, w1, w2) = s
        # world points (RB, 128)
        wx = r00 * px + r01 * py + r02 * pz + x0
        wy = r10 * px + r11 * py + r12 * pz + x1
        wz = r20 * px + r21 * py + r22 * pz + x2
        rx = wx - x0; ry = wy - x1; rz = wz - x2
        vx = v0 + w1 * rz - w2 * ry
        vy = v1 + w2 * rx - w0 * rz
        vz = v2 + w0 * ry - w1 * rx

        # terrain lookup from the cached window
        fx = (wx + d_max) * inv_res
        fy = (wy + d_max) * inv_res
        xi = fx.astype(jnp.int32)
        yi = fy.astype(jnp.int32)
        xf = fx - xi.astype(jnp.float32)
        yf = fy - yi.astype(jnp.float32)
        xl = jnp.clip(xi - sx.astype(jnp.int32), 0, _PATCH - 2)
        yl = jnp.clip(yi - sy.astype(jnp.int32), 0, _PATCH - 2)
        idx = xl * _PATCH + yl
        tz = [_gather128(win, 0, idx + off, _RB) for off in TAP_OFFSETS]
        tf = [_gather128(win, 256, idx + off, _RB) for off in TAP_OFFSETS]
        w_cc = (1 - xf) * (1 - yf)
        w_cf = (1 - xf) * yf
        w_lc = xf * (1 - yf)
        w_fl = xf * yf
        z = w_cc * tz[0] + w_cf * tz[1] + w_lc * tz[2] + w_fl * tz[3]
        mu = w_cc * tf[0] + w_cf * tf[1] + w_lc * tf[2] + w_fl * tf[3]
        dz_dx = (tz[1] - tz[0]) * inv_res
        dz_dy = (tz[2] - tz[0]) * inv_res
        ninv = lax.rsqrt(dz_dx * dz_dx + dz_dy * dz_dy + 1.0)
        nx = -dz_dx * ninv; ny = -dz_dy * ninv; nz = ninv

        dh = wz - z
        contact = mask / (1.0 + jnp.exp(10.0 * dh))
        vn = vx * nx + vy * ny + vz * nz
        n_cp = jnp.sum(contact, axis=1, keepdims=True)
        cs = -(stiff * dh + damp * vn) * contact / n_cp
        mg = m * g
        fsx = jnp.clip(cs * nx, -mg, mg)
        fsy = jnp.clip(cs * ny, -mg, mg)
        fsz = jnp.clip(cs * nz, -mg, mg)
        s_mag = jnp.sqrt(fsx * fsx + fsy * fsy + fsz * fsz)

        tn = lax.rsqrt(jnp.maximum(r00 * r00 + r10 * r10 + r20 * r20, 1e-12))
        tvl = tv_ref[:, 2 * t:2 * t + 1]
        tvr = tv_ref[:, 2 * t + 1:2 * t + 2]
        cmd = (cmd_l * tvl + cmd_r * tvr)
        t0 = r00 * tn; t1 = r10 * tn; t2 = r20 * tn
        sx_ = mu * (cmd * t0 - vx) * mask
        sy_ = mu * (cmd * t1 - vy) * mask
        sz_ = mu * (cmd * t2 - vz) * mask
        sn = sx_ * nx + sy_ * ny + sz_ * nz
        ffx = jnp.clip(s_mag * (sx_ - sn * nx), -mg, mg)
        ffy = jnp.clip(s_mag * (sy_ - sn * ny), -mg, mg)
        ffz = jnp.clip(s_mag * (sz_ - sn * nz), -mg, mg)

        fx_ = fsx + ffx; fy_ = fsy + ffy; fz_ = fsz + ffz
        tq0 = jnp.sum(ry * fz_ - rz * fy_, axis=1, keepdims=True)
        tq1 = jnp.sum(rz * fx_ - rx * fz_, axis=1, keepdims=True)
        tq2 = jnp.sum(rx * fy_ - ry * fx_, axis=1, keepdims=True)
        i00 = scal_ref[9]; i01 = scal_ref[10]; i02 = scal_ref[11]
        i11 = scal_ref[12]; i12 = scal_ref[13]; i22 = scal_ref[14]
        aw0 = jnp.clip(i00 * tq0 + i01 * tq1 + i02 * tq2, -om_max, om_max)
        aw1 = jnp.clip(i01 * tq0 + i11 * tq1 + i12 * tq2, -om_max, om_max)
        aw2 = jnp.clip(i02 * tq0 + i12 * tq1 + i22 * tq2, -om_max, om_max)
        ax = jnp.sum(fx_, axis=1, keepdims=True) / m
        ay = jnp.sum(fy_, axis=1, keepdims=True) / m
        az = jnp.sum(fz_, axis=1, keepdims=True) / m - g

        # semi-implicit euler
        v0n = v0 + ax * dt; v1n = v1 + ay * dt; v2n = v2 + az * dt
        x0n = x0 + v0n * dt; x1n = x1 + v1n * dt; x2n = x2 + v2n * dt
        w0n = w0 + aw0 * dt; w1n = w1 + aw1 * dt; w2n = w2 + aw2 * dt

        # Rodrigues (componentwise)
        theta = jnp.sqrt(w0n * w0n + w1n * w1n + w2n * w2n)
        it_ = 1.0 / jnp.maximum(theta, 1e-6)
        kx = w0n * it_; ky = w1n * it_; kz = w2n * it_
        sn_ = jnp.sin(theta * dt)
        c1 = 1.0 - jnp.cos(theta * dt)
        m00 = 1.0 + c1 * (-(ky * ky + kz * kz))
        m01 = -kz * sn_ + c1 * kx * ky
        m02 = ky * sn_ + c1 * kx * kz
        m10 = kz * sn_ + c1 * kx * ky
        m11 = 1.0 + c1 * (-(kx * kx + kz * kz))
        m12 = -kx * sn_ + c1 * ky * kz
        m20 = -ky * sn_ + c1 * kx * kz
        m21 = kx * sn_ + c1 * ky * kz
        m22 = 1.0 + c1 * (-(kx * kx + ky * ky))
        nr00 = r00 * m00 + r01 * m10 + r02 * m20
        nr01 = r00 * m01 + r01 * m11 + r02 * m21
        nr02 = r00 * m02 + r01 * m12 + r02 * m22
        nr10 = r10 * m00 + r11 * m10 + r12 * m20
        nr11 = r10 * m01 + r11 * m11 + r12 * m21
        nr12 = r10 * m02 + r11 * m12 + r12 * m22
        nr20 = r20 * m00 + r21 * m10 + r22 * m20
        nr21 = r20 * m01 + r21 * m11 + r22 * m21
        nr22 = r20 * m02 + r21 * m12 + r22 * m22

        # per-step cost statistics (std over valid points of |F_spring|);
        # roll/pitch are derived from the R planes on the XLA side (Mosaic
        # has no atan2 lowering)
        mean = jnp.sum(s_mag, axis=1, keepdims=True) / n_pts
        var = jnp.sum((s_mag - mean) * (s_mag - mean) * mask,
                      axis=1, keepdims=True) / n_pts
        spring_std = jnp.sqrt(var)

        new = (x0n, x1n, x2n, v0n, v1n, v2n, nr00, nr01, nr02, nr10, nr11,
               nr12, nr20, nr21, nr22, w0n, w1n, w2n)
        planes = new + (spring_std,)
        for j, plane in enumerate(planes):
            out_ref[:, t * 32 + j: t * 32 + j + 1] = plane
        return new

    for t in range(BLOCK_STEPS):
        state = step(state, t)

    newst_ref[:] = jnp.concatenate(state[:18], axis=1)


def fused_block_steps(scal, windows, tv_block, state18, sxy, mask, pts):
    """Run BLOCK_STEPS physics steps fully in-kernel.

    scal: (16,) SMEM scalars (incl. the symmetric inverse inertia);
    windows: (B, 512); tv_block: (B, 2*S); state18: (B, 18) packed state;
    sxy: (B, 2) int32 window corners; mask: (1, 128); pts: (8, 128).
    Returns (new_state18 (B, 18), out (B, S*32)).
    """
    B = windows.shape[0]
    S = BLOCK_STEPS
    new_state, out = pl.pallas_call(
        _kernel,
        grid=(B // _RB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_RB, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, 2 * S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, 18), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_RB, 18), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, 32 * S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 18), jnp.float32),
            jax.ShapeDtypeStruct((B, 32 * S), jnp.float32),
        ],
    )(scal, windows, tv_block, state18, sxy, mask, pts)
    return new_state, out
