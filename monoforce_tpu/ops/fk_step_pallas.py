"""Pallas TPU kernel: the per-point physics of one step, reduced in VMEM.

Motivation (measured on v5e, 4096x100-step shooting batches): with the
per-point physics expressed in XLA, every step fans into ~8 kernels
(fusions, reduce-fusions, the interp Pallas call) and ~20 (B, 128) component
planes spill to HBM at every boundary — the boundary traffic costs 3x the
math itself.

This kernel runs the whole PER-POINT part of a step — world points, point
velocities, terrain taps (lane gathers out of cached 16x16 windows),
bilinear height/friction, normals, soft contact, spring + friction forces
with the reference's clamps, torques — taking the packed rigid state (B, 18)
and reducing everything to eight (B,) planes (accelerations + cost
statistics) inside VMEM.  The 16x16 terrain windows (B, 512) are the one
large input, re-read per step (~1 ms / 100 steps at B=4096).

Two design points were measured and rejected:
- splitting/stacking the carry into eighteen (B,) planes around the kernel
  (per-step sublane<->lane relayouts, ~10 ms/100 steps);
- integrating INSIDE the kernel (Mosaic executes the ~60 narrow-column
  Rodrigues/Euler ops at ~250 cycles each — 12 ms/100 steps — where
  vectorized XLA on the packed (B, 18) carry does the same for ~1 ms).
The split that wins: per-point math in Mosaic, scalar-per-trajectory math
in XLA, carry always packed (B, 18).

Physics semantics are identical to monoforce_tpu.physics.fast._step /
engine.forward_kinematics (reference: dphysics.py:172-272); the lane
reduction sums run on the MXU (plane @ ones matmul beats Mosaic's log-pass
cross-lane shuffle reduce here).

Non-articulated robots only, euler integration (flipper/rk4 rollouts use
the differentiable fast path).  Gradients: a jnp reference implementation
(`_fk_step_xla`) backs a custom VJP and is the off-TPU fallback — the
shooting planner only ever runs the forward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monoforce_tpu.ops.interp_pallas import (TAP_OFFSETS, _block_rows,
                                             _gather128)

__all__ = ["fk_step", "fk_step_pair", "fk_step_pair_zu", "fk_step_pair3",
           "fk_step_pair3_muq", "fk_step_pair3_zu", "fk_step_packed",
           "pack_consts", "pack_points", "pack_points_pair",
           "pack_points_pair3"]

_RB = 512


def _gather_lanes(patch, base, it, rb):
    """Gather from a 256-wide source region into an ``it``-shaped target of
    width 128 or 256 (idx chunks of 128 lanes each run the 2-segment TALA
    ladder of ``_gather128``)."""
    L = it.shape[1]
    if L == 128:
        return _gather128(patch, base, it, rb)
    outs = [_gather128(patch, base, it[:, c * 128:(c + 1) * 128], rb)
            for c in range(L // 128)]
    return jnp.concatenate(outs, axis=1)

# cst layout (f32 vector in SMEM)
_C_DMAX, _C_RES, _C_STIFF, _C_DAMP, _C_MASS, _C_G = range(6)
_C_GD0, _C_GD1, _C_GD2, _C_OMAX, _C_NREAL = range(6, 11)
_C_I00, _C_I01, _C_I02, _C_I11, _C_I12, _C_I22, _C_DT = range(11, 18)
_N_CST = 18


def pack_consts(robot) -> jax.Array:
    """Scalar constants vector for fk_step from a RobotModel."""
    ii = robot.inertia_inv
    gd = robot.gravity_direction
    return jnp.stack([
        robot.d_max, robot.grid_res, robot.stiffness, robot.damping,
        robot.mass, robot.gravity, gd[0], gd[1], gd[2], robot.omega_max,
        jnp.float32(robot.points.shape[0]),
        ii[0, 0], ii[0, 1], ii[0, 2], ii[1, 1], ii[1, 2], ii[2, 2],
        robot.dt,
    ]).astype(jnp.float32)


def pack_points(robot) -> jax.Array:
    """(8, PW) constant point planes: px, py, pz, mask, 4 driving masks."""
    P = robot.points.shape[0]
    pw = 128 * ((P + 127) // 128)
    pad = pw - P

    def padp(a):
        return jnp.pad(jnp.asarray(a, jnp.float32), (0, pad))

    rows = [padp(robot.points[:, 0]), padp(robot.points[:, 1]),
            padp(robot.points[:, 2]), padp(jnp.ones((P,), jnp.float32))]
    K = robot.driving_masks.shape[0]
    for k in range(4):
        rows.append(padp(robot.driving_masks[k]) if k < K
                    else jnp.zeros((pw,), jnp.float32))
    return jnp.stack(rows)


def _mxu_reduce(planes, ones_col):
    """Sum each (RB, PW) plane over lanes via one MXU matmul per plane."""
    outs = []
    for p in planes:
        s = jax.lax.dot_general(
            p, ones_col, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(s[:, 0:1])
    return outs


def _unpack_hi(word):
    """High bf16 half of a packed f32 word, as f32."""
    ui = lax.bitcast_convert_type(word, jnp.uint32)
    return lax.bitcast_convert_type(ui & jnp.uint32(0xFFFF0000), jnp.float32)


def _unpack_lo(word):
    """Low bf16 half of a packed f32 word, as f32."""
    ui = lax.bitcast_convert_type(word, jnp.uint32)
    return lax.bitcast_convert_type(ui << 16, jnp.float32)


def _step_math(cst, patch, state, tv, sxy, pts, n_k, gather, reduce_lanes,
               packed=False):
    """Per-point step math (jnp ops; runs in-kernel and as the XLA
    reference).  Returns (B, 8): [ax, ay, az, aw0, aw1, aw2, s_std, n_cp].

    ``packed=True``: ``patch`` is (B, 256) f32 words holding bf16 [z | mu]
    per cell — the four bilinear taps fetch BOTH height and friction in one
    gather each (half the tap ladders of the f32 [z(256) | mu(256)] layout;
    the bf16 quantization is the serving path's documented trade)."""
    d_max = cst[_C_DMAX]
    stiff = cst[_C_STIFF]
    damp = cst[_C_DAMP]
    m = cst[_C_MASS]
    g = cst[_C_G]
    n_real = cst[_C_NREAL]

    px = pts[0:1, :]
    py = pts[1:2, :]
    pz = pts[2:3, :]
    maskv = pts[3:4, :]

    x0 = state[:, 0:1]
    x1 = state[:, 1:2]
    x2 = state[:, 2:3]
    v0 = state[:, 3:4]
    v1 = state[:, 4:5]
    v2 = state[:, 5:6]
    r00 = state[:, 6:7]
    r01 = state[:, 7:8]
    r02 = state[:, 8:9]
    r10 = state[:, 9:10]
    r11 = state[:, 10:11]
    r12 = state[:, 11:12]
    r20 = state[:, 12:13]
    r21 = state[:, 13:14]
    r22 = state[:, 14:15]
    w0 = state[:, 15:16]
    w1 = state[:, 16:17]
    w2 = state[:, 17:18]

    # rotated body points (= lever arms) and world points
    rx = r00 * px + r01 * py + r02 * pz
    ry = r10 * px + r11 * py + r12 * pz
    rz = r20 * px + r21 * py + r22 * pz
    wx = rx + x0
    wy = ry + x1
    wz = rz + x2

    # point velocities (Koenig)
    vx = v0 + w1 * rz - w2 * ry
    vy = v1 + w2 * rx - w0 * rz
    vz = v2 + w0 * ry - w1 * rx

    # terrain lookup out of the cached window
    # DIVIDE like the reference: reciprocal-multiply flips the int32
    # truncation on ~1.5e-6 of boundary queries (measured)
    res = cst[_C_RES]
    fxq = (wx + d_max) / res
    fyq = (wy + d_max) / res
    xi = fxq.astype(jnp.int32)
    yi = fyq.astype(jnp.int32)
    xf = fxq - xi.astype(jnp.float32)
    yf = fyq - yi.astype(jnp.float32)
    sx = sxy[:, 0:1].astype(jnp.int32)
    sy = sxy[:, 1:2].astype(jnp.int32)
    xl = jnp.clip(xi - sx, 0, 14)
    yl = jnp.clip(yi - sy, 0, 14)
    idx = xl * 16 + yl
    if packed:
        tw = [gather(patch, 0, idx + off) for off in TAP_OFFSETS]
        tz = [_unpack_hi(w) for w in tw]
        tf = [_unpack_lo(w) for w in tw]
    else:
        tz = [gather(patch, 0, idx + off) for off in TAP_OFFSETS]
        tf = [gather(patch, 256, idx + off) for off in TAP_OFFSETS]
    w_cc = (1 - xf) * (1 - yf)
    w_cf = (1 - xf) * yf
    w_lc = xf * (1 - yf)
    w_fl = xf * yf
    z = w_cc * tz[0] + w_cf * tz[1] + w_lc * tz[2] + w_fl * tz[3]
    mu = w_cc * tf[0] + w_cf * tf[1] + w_lc * tf[2] + w_fl * tf[3]
    dz_dx = (tz[1] - tz[0]) / res
    dz_dy = (tz[2] - tz[0]) / res
    ninv = lax.rsqrt(dz_dx * dz_dx + dz_dy * dz_dy + 1.0)
    nx = -dz_dx * ninv
    ny = -dz_dy * ninv
    nz = ninv

    # soft contact + spring-damper (dphysics.py:220-234), ghosts masked
    dh = wz - z
    contact = maskv / (1.0 + jnp.exp(10.0 * dh))
    vn = vx * nx + vy * ny + vz * nz
    scale = -(stiff * dh + damp * vn)
    (n_cp,) = reduce_lanes([contact])
    # guard the reference's unguarded 0/0 at exactly-zero contact ONLY (see
    # physics/fast.py) — n_cp stays the raw sum in the stats output
    cs = scale * contact / jnp.where(n_cp > 0, n_cp, 1.0)
    mg = m * g
    fsx = jnp.clip(cs * nx, -mg, mg)
    fsy = jnp.clip(cs * ny, -mg, mg)
    fsz = jnp.clip(cs * nz, -mg, mg)
    spring_mag = jnp.sqrt(fsx * fsx + fsy * fsy + fsz * fsz + 1e-30)

    # velocity-based friction (dphysics.py:236-252)
    tn = lax.rsqrt(jnp.maximum(r00 * r00 + r10 * r10 + r20 * r20, 1e-12))
    t0 = r00 * tn
    t1 = r10 * tn
    t2 = r20 * tn
    cmd = tv[:, 0:1] * pts[4:5, :]
    for k in range(1, n_k):
        cmd = cmd + tv[:, k:k + 1] * pts[4 + k:5 + k, :]
    sfx = mu * (cmd * t0 - vx)
    sfy = mu * (cmd * t1 - vy)
    sfz = mu * (cmd * t2 - vz)
    sn = sfx * nx + sfy * ny + sfz * nz
    ffx = jnp.clip(spring_mag * (sfx - sn * nx), -mg, mg)
    ffy = jnp.clip(spring_mag * (sfy - sn * ny), -mg, mg)
    ffz = jnp.clip(spring_mag * (sfz - sn * nz), -mg, mg)

    # torques + force sums + spring statistics
    fx_ = fsx + ffx
    fy_ = fsy + ffy
    fz_ = fsz + ffz
    tq0p = ry * fz_ - rz * fy_
    tq1p = rz * fx_ - rx * fz_
    tq2p = rx * fy_ - ry * fx_
    (tq0, tq1, tq2, sfx_s, sfy_s, sfz_s, s_sum) = reduce_lanes(
        [tq0p, tq1p, tq2p, fx_, fy_, fz_, spring_mag])
    s_mean = s_sum / n_real
    (s_var,) = reduce_lanes([(spring_mag - s_mean) ** 2 * maskv])
    s_std = jnp.sqrt(s_var / n_real + 1e-30)

    om = cst[_C_OMAX]
    i00 = cst[_C_I00]
    i01 = cst[_C_I01]
    i02 = cst[_C_I02]
    i11 = cst[_C_I11]
    i12 = cst[_C_I12]
    i22 = cst[_C_I22]
    aw0 = jnp.clip(i00 * tq0 + i01 * tq1 + i02 * tq2, -om, om)
    aw1 = jnp.clip(i01 * tq0 + i11 * tq1 + i12 * tq2, -om, om)
    aw2 = jnp.clip(i02 * tq0 + i12 * tq1 + i22 * tq2, -om, om)
    ax = (m * g * cst[_C_GD0] + sfx_s) / m
    ay = (m * g * cst[_C_GD1] + sfy_s) / m
    az = (m * g * cst[_C_GD2] + sfz_s) / m
    return jnp.concatenate(
        [ax, ay, az, aw0, aw1, aw2, s_std, n_cp], axis=1)   # (B, 8)


def _fk_step_kernel(cst_ref, patch_ref, state_ref, tv_ref, sxy_ref, pts_ref,
                    ones_ref, out_ref):
    patch = patch_ref[:]
    rb = patch.shape[0]
    ones_col = ones_ref[:]
    out_ref[:] = _step_math(
        cst_ref, patch, state_ref[:], tv_ref[:], sxy_ref[:], pts_ref[:],
        n_k=4,
        gather=lambda p, b, it: _gather128(p, b, it, rb),
        reduce_lanes=lambda planes: _mxu_reduce(planes, ones_col))


def _fk_step_xla(cst, patch, state, tv, sxy, pts):
    def gather(p, base, it):
        return jnp.take_along_axis(p[:, base:base + 256],
                                   jnp.clip(it, 0, 255), axis=1)

    def reduce_lanes(planes):
        return [jnp.sum(p, axis=1, keepdims=True) for p in planes]

    return _step_math(cst, patch, state, tv, sxy, pts, n_k=4,
                      gather=gather, reduce_lanes=reduce_lanes)


def _fk_step_pallas(cst, patch, state, tv, sxy, pts, rb):
    B = patch.shape[0]
    pw = pts.shape[1]
    ones_col = jnp.ones((pw, 8), jnp.float32)
    return pl.pallas_call(
        _fk_step_kernel,
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 18), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pw, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
    )(cst, patch, state, tv, sxy, pts, ones_col)


@jax.custom_vjp
def fk_step(cst, patch, state, tv, sxy, pts):
    """Per-point forward kinematics, reduced in-VMEM to (B, 8).

    cst: (18,) scalar constants (pack_consts); patch: (B, 512) flattened
    [z | friction] windows; state: (B, 18) packed rigid state; tv: (B, 8)
    track velocities (first K lanes used); sxy: (B, 2) window corners;
    pts: (8, PW) point planes (pack_points), PW == 128 only on the TPU path.
    Returns (B, 8): [ax, ay, az, aw0, aw1, aw2, spring_std, n_contacts].
    Integration + the Rodrigues update run OUTSIDE (vectorized XLA on the
    packed (B, 18) carry — measured 4x cheaper than Mosaic's narrow-column
    arithmetic for the same math).
    """
    rb = _block_rows(patch.shape[0])
    if jax.default_backend() == "tpu" and rb and pts.shape[1] == 128:
        return _fk_step_pallas(cst, patch, state, tv, sxy, pts, rb)
    return _fk_step_xla(cst, patch, state, tv, sxy, pts)


def _fks_fwd(cst, patch, state, tv, sxy, pts):
    return fk_step(cst, patch, state, tv, sxy, pts), \
        (cst, patch, state, tv, sxy, pts)


def _fks_bwd(res, g):
    cst, patch, state, tv, sxy, pts = res
    _, vjp = jax.vjp(
        lambda p, s, t: _fk_step_xla(cst, p, s, t, sxy, pts),
        patch, state, tv)
    dp, ds, dt_ = vjp(g)
    return None, dp, ds, dt_, None, None


fk_step.defvjp(_fks_fwd, _fks_bwd)


# ------------------------------------------------------ packed single mode
#
# Serving variant for contact presets with 64 < P <= 256 points (the
# reference's own 0.1 m voxel preset is 138-202 points): ONE trajectory per
# row, per-point planes up to (RB, 256) (two registers), with the pair
# mode's bf16 [z | mu] packed tap words — four gathers fetch BOTH height
# and friction (the f32 layout needs eight), and the window extraction
# produces half the bytes.  Unlike pair mode, friction keeps the exact
# reference bilinear weights (both halves ride the same four taps).


def _fk_packed_kernel(cst_ref, patch_ref, state_ref, tv_ref, sxy_ref,
                      pts_ref, ones_ref, out_ref):
    patch = patch_ref[:]
    rb = patch.shape[0]
    ones_col = ones_ref[:]
    out_ref[:] = _step_math(
        cst_ref, patch, state_ref[:], tv_ref[:], sxy_ref[:], pts_ref[:],
        n_k=4,
        gather=lambda p, b, it: _gather_lanes(p, b, it, rb),
        reduce_lanes=lambda planes: _mxu_reduce(planes, ones_col),
        packed=True)


def _fk_step_packed_xla(cst, patch, state, tv, sxy, pts):
    def gather(p, base, it):
        return jnp.take_along_axis(p[:, base:base + 256],
                                   jnp.clip(it, 0, 255), axis=1)

    def reduce_lanes(planes):
        return [jnp.sum(p, axis=1, keepdims=True) for p in planes]

    return _step_math(cst, patch, state, tv, sxy, pts, n_k=4,
                      gather=gather, reduce_lanes=reduce_lanes, packed=True)


def _fk_step_packed_pallas(cst, patch, state, tv, sxy, pts, rb):
    B = patch.shape[0]
    pw = pts.shape[1]
    ones_col = jnp.ones((pw, 8), jnp.float32)
    return pl.pallas_call(
        _fk_packed_kernel,
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 18), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pw, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
    )(cst, patch, state, tv, sxy, pts, ones_col)


def fk_step_packed(cst, patch, state, tv, sxy, pts):
    """Per-point forward kinematics on bf16 [z|mu] packed windows, reduced
    in-VMEM to (B, 8) — the serving step for 64 < P <= 256 contact presets
    (forward-only; the shooting planner never differentiates this path).

    cst: (18,) (pack_consts); patch: (B, 256) packed window words
    (physics.fast._extract_windows_packed1); state: (B, 18); tv: (B, 8);
    sxy: (B, 2); pts: (8, PW) (pack_points) with PW in {128, 256}.
    Returns (B, 8): [ax, ay, az, aw0, aw1, aw2, spring_std, n_contacts].
    """
    pw = pts.shape[1]
    rb = _block_rows(patch.shape[0])
    if jax.default_backend() == "tpu" and rb and pw in (128, 256):
        if pw == 256 and rb > 256:
            rb = 256  # half the rows at two registers/row keeps VMEM flat
        return _fk_step_packed_pallas(cst, patch, state, tv, sxy, pts, rb)
    return _fk_step_packed_xla(cst, patch, state, tv, sxy, pts)


# --------------------------------------------------------------- pair mode
#
# Serving-grade variant for contact presets with P <= 64 points: TWO
# trajectories share each 128-lane register row (lanes 0-63 = trajectory 2i,
# lanes 64-127 = trajectory 2i+1), halving the per-point VPU element count —
# the measured roofline of the exact path (docs/PERFORMANCE.md).  The
# terrain windows arrive as (B/2, 512) f32 words with bf16 [z | friction]
# packed per cell, so the four bilinear taps for BOTH quantities cost one
# lane gather each.  Accuracy trades vs fk_step (documented, gated by
# trajectory-RMSE + cost-ranking tests): bf16-quantized terrain/friction
# taps and the coarser contact preset itself.

def pack_points_pair(robot) -> jax.Array:
    """(8, 128) point planes with the P <= 64 contact set mirrored into both
    register halves: px, py, pz, mask, 4 driving masks."""
    P = robot.points.shape[0]
    if P > 64:
        raise ValueError(f"pair mode needs P <= 64 contact points, got {P}")

    def padp(a):
        h = jnp.pad(jnp.asarray(a, jnp.float32), (0, 64 - P))
        return jnp.concatenate([h, h])

    rows = [padp(robot.points[:, 0]), padp(robot.points[:, 1]),
            padp(robot.points[:, 2]), padp(jnp.ones((P,), jnp.float32))]
    K = robot.driving_masks.shape[0]
    for k in range(4):
        rows.append(padp(robot.driving_masks[k]) if k < K
                    else jnp.zeros((128,), jnp.float32))
    return jnp.stack(rows)


def _unpack_pair(word, hs):
    """A packed f32 word holds two bf16 values: the A-half trajectory's in
    the high 16 bits, the B-half's in the low 16.  Select per lane half."""
    return jnp.where(hs, _unpack_hi(word), _unpack_lo(word))


def _step_math_pair(cst, patch, state2, tv2, sxy2, pts, n_k, gather2,
                    reduce_halves, half_mask, packed_zmu=False):
    """fk_step's per-point physics with two trajectories per register row.

    state2: (BP, 36) = [state_A(18) | state_B(18)]; tv2: (BP, 16); sxy2:
    (BP, 4); ``half_mask`` is a (BP, PW) bool plane, True on trajectory A's
    lanes; ``reduce_halves(planes)`` returns [(sum_A, sum_B), ...] as
    (BP, 1) pairs.  Two window layouts:

    - ``packed_zmu=False`` (pair mode, P <= 64, PW=128): patch is (BP, 512)
      = [[z_A|z_B](256) | [mu_A|mu_B](256)] bf16 PAIR words — one word
      holds both trajectories' values for a cell; friction is a nearest-cell
      lookup (documented trade).
    - ``packed_zmu=True`` (pair3 mode, 64 < P <= 192, PW=384): patch is
      (BP, 512) = [w_A(256) | w_B(256)] where each half is the bf16
      [z | mu] per-cell packed window (physics/fast._extract_windows_packed1)
      of ONE trajectory; the four bilinear taps fetch height AND friction
      with the exact reference weights (``gather2`` routes each lane to its
      trajectory's window half).

    Returns (BP, 16) = [acc_A(8) | acc_B(8)],
    acc = [ax, ay, az, aw0, aw1, aw2, spring_std, n_contacts].
    Same formulas as _step_math (reference dphysics.py:172-272)."""
    d_max = cst[_C_DMAX]
    stiff = cst[_C_STIFF]
    damp = cst[_C_DAMP]
    m = cst[_C_MASS]
    g = cst[_C_G]
    n_real = cst[_C_NREAL]
    hs = half_mask

    def sel(arr, col, off):
        return jnp.where(hs, arr[:, col:col + 1], arr[:, col + off:col + off + 1])

    st = [sel(state2, j, 18) for j in range(18)]
    (x0, x1, x2, v0, v1, v2,
     r00, r01, r02, r10, r11, r12, r20, r21, r22, w0, w1, w2) = st

    px = pts[0:1, :]
    py = pts[1:2, :]
    pz = pts[2:3, :]
    maskv = pts[3:4, :]

    rx = r00 * px + r01 * py + r02 * pz
    ry = r10 * px + r11 * py + r12 * pz
    rz = r20 * px + r21 * py + r22 * pz
    wx = rx + x0
    wy = ry + x1
    wz = rz + x2
    vx = v0 + w1 * rz - w2 * ry
    vy = v1 + w2 * rx - w0 * rz
    vz = v2 + w0 * ry - w1 * rx

    # serving trade: reciprocal-multiply instead of the reference's divide —
    # flips the int32 truncation on ~1.5e-6 of exact-boundary queries, far
    # below the bf16 tap quantization this path already accepts, and the two
    # f32 VPU divides cost a measured 2.2 us/call (scripts/kablate.py).  The
    # exact paths (fk_step / fast_rollout / engine) keep the divide.
    res = cst[_C_RES]
    inv_res = 1.0 / res
    fxq = (wx + d_max) * inv_res
    fyq = (wy + d_max) * inv_res
    xi = fxq.astype(jnp.int32)
    yi = fyq.astype(jnp.int32)
    xf = fxq - xi.astype(jnp.float32)
    yf = fyq - yi.astype(jnp.float32)
    sx = sel(sxy2, 0, 2).astype(jnp.int32)
    sy = sel(sxy2, 1, 2).astype(jnp.int32)
    xl = jnp.clip(xi - sx, 0, 14)
    yl = jnp.clip(yi - sy, 0, 14)
    idx = xl * 16 + yl
    w_cc = (1 - xf) * (1 - yf)
    w_cf = (1 - xf) * yf
    w_lc = xf * (1 - yf)
    w_fl = xf * yf
    if packed_zmu == "zpair":
        # uniform-friction pair3: each tap word is [z(i,j) | z(i,j+1)] for
        # THIS lane's trajectory — TWO gathers (idx, idx+16) fetch all four
        # bilinear taps (TAP_OFFSETS order: 0 -> hi(w0), 16 -> hi(w1),
        # 1 -> lo(w0), 17 -> lo(w1)); friction is exactly 1.0 (the
        # planner's friction=None default, reference dphysics.py:561-563)
        tw0 = gather2(patch, 0, idx)
        tw1 = gather2(patch, 0, idx + 16)
        tz = [_unpack_hi(tw0), _unpack_hi(tw1),
              _unpack_lo(tw0), _unpack_lo(tw1)]
        mu = None
    elif packed_zmu == "pairz":
        # uniform-friction pair mode: the patch is the (BP, 256) [z_A|z_B]
        # pair-word plane alone — no friction plane exists, no mu gather,
        # and all friction multiplies drop out (mu == 1.0 exactly, the
        # planner's friction=None default, reference dphysics.py:561-563)
        tz = [_unpack_pair(gather2(patch, 0, idx + off), hs)
              for off in TAP_OFFSETS]
        mu = None
    elif packed_zmu == "muq":
        # pair3 with a NON-uniform friction grid at the gather information
        # floor: z rides the zu path's z-pair words (two gathers fetch all
        # four bf16 bilinear taps), and ONE more gather fetches a friction
        # QUAD word — the four mu taps of this cell packed as u8 at scale
        # 1/64 in TAP_OFFSETS order [c, c+16, c+1, c+17] — applied with the
        # exact reference bilinear weights.  Three gathers total (vs four
        # for the [z|mu] layout): 8 tap values x >=8 significant bits
        # cannot fit fewer 32-bit gathers.  The accuracy trade vs
        # fk_step_pair3 is mu's u8 step (<=1/128 absolute, comparable to
        # the bf16 z taps' own quantization and finer than pair mode's
        # nearest-cell mu); gated in tests/test_fast.py::test_muq_*.
        tw0 = gather2(patch, 0, idx)
        tw1 = gather2(patch, 0, idx + 16)
        tz = [_unpack_hi(tw0), _unpack_hi(tw1),
              _unpack_lo(tw0), _unpack_lo(tw1)]
        mq = lax.bitcast_convert_type(gather2(patch, 256, idx), jnp.int32)
        m0 = ((mq >> 24) & 255).astype(jnp.float32)
        m1 = ((mq >> 16) & 255).astype(jnp.float32)
        m2 = ((mq >> 8) & 255).astype(jnp.float32)
        m3 = (mq & 255).astype(jnp.float32)
        mu = (w_cc * m0 + w_cf * m1 + w_lc * m2 + w_fl * m3) * (1.0 / 64.0)
    elif packed_zmu:
        # pair3: each tap word is [z | mu] for THIS lane's trajectory — four
        # gathers fetch both quantities, friction keeps exact bilinear
        tw = [gather2(patch, 0, idx + off) for off in TAP_OFFSETS]
        tz = [_unpack_hi(w) for w in tw]
        tf = [_unpack_lo(w) for w in tw]
        mu = w_cc * tf[0] + w_cf * tf[1] + w_lc * tf[2] + w_fl * tf[3]
    else:
        # pair: z taps from the [z_A | z_B] word plane (patch lanes 0-255);
        # friction is a NEAREST-cell lookup from the [mu_A | mu_B] plane
        # (lanes 256-511) — one gather instead of four (a documented
        # pair-mode trade; exact when the friction grid is uniform)
        tz = [_unpack_pair(gather2(patch, 0, idx + off), hs)
              for off in TAP_OFFSETS]
        mu = _unpack_pair(gather2(patch, 256, idx), hs)
    z = w_cc * tz[0] + w_cf * tz[1] + w_lc * tz[2] + w_fl * tz[3]
    dz_dx = (tz[1] - tz[0]) / res
    dz_dy = (tz[2] - tz[0]) / res
    ninv = lax.rsqrt(dz_dx * dz_dx + dz_dy * dz_dy + 1.0)
    nx = -dz_dx * ninv
    ny = -dz_dy * ninv
    nz = ninv

    dh = wz - z
    contact = maskv / (1.0 + jnp.exp(10.0 * dh))
    vn = vx * nx + vy * ny + vz * nz
    scale = -(stiff * dh + damp * vn)
    ((ncp_a, ncp_b),) = reduce_halves([contact])
    n_cp = jnp.where(hs, ncp_a, ncp_b)
    # same exactly-zero-contact guard as _step_math / physics/fast.py
    cs = scale * contact / jnp.where(n_cp > 0, n_cp, 1.0)
    mg = m * g
    fsx = jnp.clip(cs * nx, -mg, mg)
    fsy = jnp.clip(cs * ny, -mg, mg)
    fsz = jnp.clip(cs * nz, -mg, mg)
    spring_mag = jnp.sqrt(fsx * fsx + fsy * fsy + fsz * fsz + 1e-30)

    tn = lax.rsqrt(jnp.maximum(r00 * r00 + r10 * r10 + r20 * r20, 1e-12))
    t0 = r00 * tn
    t1 = r10 * tn
    t2 = r20 * tn
    cmd = sel(tv2, 0, 8) * pts[4:5, :]
    for k in range(1, n_k):
        cmd = cmd + sel(tv2, k, 8) * pts[4 + k:5 + k, :]
    if mu is None:       # uniform friction: mu == 1.0 exactly
        sfx = cmd * t0 - vx
        sfy = cmd * t1 - vy
        sfz = cmd * t2 - vz
    else:
        sfx = mu * (cmd * t0 - vx)
        sfy = mu * (cmd * t1 - vy)
        sfz = mu * (cmd * t2 - vz)
    sn = sfx * nx + sfy * ny + sfz * nz
    ffx = jnp.clip(spring_mag * (sfx - sn * nx), -mg, mg)
    ffy = jnp.clip(spring_mag * (sfy - sn * ny), -mg, mg)
    ffz = jnp.clip(spring_mag * (sfz - sn * nz), -mg, mg)

    fx_ = fsx + ffx
    fy_ = fsy + ffy
    fz_ = fsz + ffz
    tq0p = ry * fz_ - rz * fy_
    tq1p = rz * fx_ - rx * fz_
    tq2p = rx * fy_ - ry * fx_
    # spring-force statistics via sum + sum-of-squares in the SAME reduce
    # round (one fewer dependent MXU pass; E[s^2]-E[s]^2 cancellation is
    # ~1e-2 N on ~1e2 N statistics — far below the cost statistic's own
    # sensitivity, see docs/PERFORMANCE.md ranking study)
    reduced = reduce_halves([tq0p, tq1p, tq2p, fx_, fy_, fz_, spring_mag,
                             spring_mag * spring_mag])

    om = cst[_C_OMAX]
    i00 = cst[_C_I00]
    i01 = cst[_C_I01]
    i02 = cst[_C_I02]
    i11 = cst[_C_I11]
    i12 = cst[_C_I12]
    i22 = cst[_C_I22]
    halves = []
    for h in range(2):
        (tq0, tq1, tq2, sfx_s, sfy_s, sfz_s, s_sum, s_sumsq) = (
            r[h] for r in reduced)
        n_cp_h = (ncp_a, ncp_b)[h]
        aw0 = jnp.clip(i00 * tq0 + i01 * tq1 + i02 * tq2, -om, om)
        aw1 = jnp.clip(i01 * tq0 + i11 * tq1 + i12 * tq2, -om, om)
        aw2 = jnp.clip(i02 * tq0 + i12 * tq1 + i22 * tq2, -om, om)
        ax = (m * g * cst[_C_GD0] + sfx_s) / m
        ay = (m * g * cst[_C_GD1] + sfy_s) / m
        az = (m * g * cst[_C_GD2] + sfz_s) / m
        s_mean = s_sum / n_real
        s_var = jnp.maximum(s_sumsq / n_real - s_mean * s_mean, 0.0)
        s_std = jnp.sqrt(s_var + 1e-30)
        halves += [ax, ay, az, aw0, aw1, aw2, s_std, n_cp_h]
    return jnp.concatenate(halves, axis=1)    # (BP, 16)


def _mxu_reduce_halves(planes, ones2):
    """Per-half lane sums via one MXU matmul per plane.

    ones2: (128, 16) with column 0 = lanes 0-63, column 8 = lanes 64-127.
    Returns [(sum_A, sum_B), ...] as (BP, 1) pairs."""
    outs = []
    for p in planes:
        s = jax.lax.dot_general(
            p, ones2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((s[:, 0:1], s[:, 8:9]))
    return outs


def _half_ones2():
    o = jnp.zeros((128, 16), jnp.float32)
    o = o.at[:64, 0].set(1.0)
    o = o.at[64:, 8].set(1.0)
    return o


def _fk_pair_kernel(cst_ref, patch_ref, state_ref, tv_ref, sxy_ref, pts_ref,
                    ones_ref, out_ref, *, n_k, zmode=False):
    patch = patch_ref[:]
    rb = patch.shape[0]
    ones2 = ones_ref[:]
    hs = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 1) < 64
    out_ref[:] = _step_math_pair(
        cst_ref, patch, state_ref[:], tv_ref[:], sxy_ref[:], pts_ref[:],
        n_k=n_k, packed_zmu="pairz" if zmode else False,
        gather2=lambda p, b, it: _gather128(p, b, it, rb),
        reduce_halves=lambda planes: _mxu_reduce_halves(planes, ones2),
        half_mask=hs)


def _fk_pair_xla(cst, patch, state2, tv2, sxy2, pts, n_k=4, zmode=False):
    bp = patch.shape[0]
    hs = jax.lax.broadcasted_iota(jnp.int32, (bp, 128), 1) < 64

    def gather2(p, base, it):
        return jnp.take_along_axis(p[:, base:base + 256],
                                   jnp.clip(it, 0, 255), axis=1)

    def reduce_halves(planes):
        return [(jnp.sum(jnp.where(hs, p, 0.0), axis=1, keepdims=True),
                 jnp.sum(jnp.where(hs, 0.0, p), axis=1, keepdims=True))
                for p in planes]

    return _step_math_pair(cst, patch, state2, tv2, sxy2, pts, n_k=n_k,
                           packed_zmu="pairz" if zmode else False,
                           gather2=gather2, reduce_halves=reduce_halves,
                           half_mask=hs)


def _fk_pair_pallas(cst, patch, state2, tv2, sxy2, pts, n_k, rb, zmode=False):
    import functools

    BP = patch.shape[0]
    ones2 = _half_ones2()
    return pl.pallas_call(
        functools.partial(_fk_pair_kernel, n_k=n_k, zmode=zmode),
        grid=(BP // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, patch.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 36), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BP, 16), jnp.float32),
    )(cst, patch, state2, tv2, sxy2, pts, ones2)


def fk_step_pair(cst, patch, state2, tv2, sxy2, pts, n_k: int = 4):
    """Pair-packed fk_step: two trajectories per register row (forward-only;
    the shooting planner never differentiates this path).

    cst: (18,) (pack_consts); patch: (BP, 512) packed bf16 [z|mu] window
    words, BP = B/2; state2: (BP, 36); tv2: (BP, 16); sxy2: (BP, 4);
    pts: (8, 128) (pack_points_pair); n_k: number of driving-mask rows
    actually used (static — 2 for tracked robots halves the cmd selects).
    Returns (BP, 16) = two interleaved (B, 8) acceleration/stat vectors.
    """
    rb = _block_rows(patch.shape[0])
    if jax.default_backend() == "tpu" and rb:
        return _fk_pair_pallas(cst, patch, state2, tv2, sxy2, pts, n_k, rb)
    return _fk_pair_xla(cst, patch, state2, tv2, sxy2, pts, n_k)


def fk_step_pair_zu(cst, patch, state2, tv2, sxy2, pts, n_k: int = 4):
    """Pair-packed fk_step for UNIFORM friction (mu == 1 exactly — the
    planner's friction=None default, reference dphysics.py:561-563).

    patch: (BP, 256) — the [z_A|z_B] pair-word plane ALONE
    (physics/fast._extract_windows_packed with friction=None): the
    nearest-cell friction gather and all friction multiplies drop out of
    the kernel, and the extraction emits half the bytes.  Other args as
    fk_step_pair.  Returns (BP, 16)."""
    rb = _block_rows(patch.shape[0])
    if jax.default_backend() == "tpu" and rb:
        return _fk_pair_pallas(cst, patch, state2, tv2, sxy2, pts, n_k, rb,
                               zmode=True)
    return _fk_pair_xla(cst, patch, state2, tv2, sxy2, pts, n_k, zmode=True)


# ------------------------------------------------------------- pair3 mode
#
# Serving variant for 64 < P <= 192 contact presets — crucially including
# the reference's own 0.1 m voxel cloud (148 points for tradr,
# dphys_config.py:8) — that removes packed single mode's 42% lane waste:
# TWO trajectories share each row across THREE 128-lane registers
# (lanes 0-191 = trajectory 2i, 192-383 = 2i+1), cutting the per-point VPU
# element count per trajectory from 256 to 192 lanes (the measured
# roofline).  Gather cost per trajectory is unchanged (each 128-lane target
# chunk runs the same 2-segment ladder into its trajectory's 256-word
# window half), and friction keeps the exact reference bilinear weights —
# the only accuracy trade vs the exact path remains the bf16 tap
# quantization.


def pack_points_pair3(robot) -> jax.Array:
    """(8, 384) point planes with the 64 < P <= 192 contact set mirrored
    into both 192-lane halves: px, py, pz, mask, 4 driving masks."""
    P = robot.points.shape[0]
    if not 64 < P <= 192:
        raise ValueError(f"pair3 mode needs 64 < P <= 192 points, got {P}")

    def padp(a):
        h = jnp.pad(jnp.asarray(a, jnp.float32), (0, 192 - P))
        return jnp.concatenate([h, h])

    rows = [padp(robot.points[:, 0]), padp(robot.points[:, 1]),
            padp(robot.points[:, 2]), padp(jnp.ones((P,), jnp.float32))]
    K = robot.driving_masks.shape[0]
    for k in range(4):
        rows.append(padp(robot.driving_masks[k]) if k < K
                    else jnp.zeros((384,), jnp.float32))
    return jnp.stack(rows)


def _gather384(patch, it, rb, base_a=0, base_b=256):
    """Per-lane routed gather for pair3: lanes 0-191 read trajectory A's
    packed window (patch[:, base_a:base_a+256]), lanes 192-383 read B's
    (base_b:base_b+256).  Chunk 0 is pure A, chunk 2 pure B; only the middle
    chunk pays a second ladder + select.  Non-default bases address the muq
    layout's planes ([zpair_A | muquad_A | zpair_B | muquad_B], 1024 wide)."""
    outs = []
    for ci in range(3):
        idxc = it[:, ci * 128:(ci + 1) * 128]
        if ci == 0:
            outs.append(_gather128(patch, base_a, idxc, rb))
        elif ci == 2:
            outs.append(_gather128(patch, base_b, idxc, rb))
        else:
            ga = _gather128(patch, base_a, idxc, rb)
            gb = _gather128(patch, base_b, idxc, rb)
            hsc = jax.lax.broadcasted_iota(jnp.int32, (rb, 128), 1) < 64
            outs.append(jnp.where(hsc, ga, gb))
    return jnp.concatenate(outs, axis=1)


def _half_ones3():
    """(384, 16) reduce matrix: column 0 sums trajectory A's 192 lanes,
    column 8 trajectory B's (output columns align with the (BP, 16)
    [acc_A | acc_B] layout)."""
    o = jnp.zeros((384, 16), jnp.float32)
    o = o.at[:192, 0].set(1.0)
    o = o.at[192:, 8].set(1.0)
    return o


def _fk_pair3_kernel(cst_ref, patch_ref, state_ref, tv_ref, sxy_ref, pts_ref,
                     ones_ref, out_ref, *, n_k, zmode=True):
    patch = patch_ref[:]
    rb = patch.shape[0]
    ones2 = ones_ref[:]
    hs = jax.lax.broadcasted_iota(jnp.int32, (rb, 384), 1) < 192
    # muq layout is [zpair_A | muquad_A | zpair_B | muquad_B] (1024 wide):
    # trajectory B's plane of either kind sits 512 past A's
    b_off = 512 if zmode == "muq" else 256
    out_ref[:] = _step_math_pair(
        cst_ref, patch, state_ref[:], tv_ref[:], sxy_ref[:], pts_ref[:],
        n_k=n_k,
        gather2=lambda p, b, it: _gather384(p, it, rb, base_a=b,
                                            base_b=b + b_off),
        reduce_halves=lambda planes: _mxu_reduce_halves(planes, ones2),
        half_mask=hs, packed_zmu=zmode)


def _fk_pair3_xla(cst, patch, state2, tv2, sxy2, pts, n_k=4, zmode=True):
    bp = patch.shape[0]
    hs = jax.lax.broadcasted_iota(jnp.int32, (bp, 384), 1) < 192
    b_off = 512 if zmode == "muq" else 256

    def gather2(p, base, it):
        ic = jnp.clip(it, 0, 255)
        va = jnp.take_along_axis(p[:, base:base + 256], ic, axis=1)
        vb = jnp.take_along_axis(p[:, base + b_off:base + b_off + 256],
                                 ic, axis=1)
        return jnp.where(hs, va, vb)

    def reduce_halves(planes):
        return [(jnp.sum(jnp.where(hs, p, 0.0), axis=1, keepdims=True),
                 jnp.sum(jnp.where(hs, 0.0, p), axis=1, keepdims=True))
                for p in planes]

    return _step_math_pair(cst, patch, state2, tv2, sxy2, pts, n_k=n_k,
                           gather2=gather2, reduce_halves=reduce_halves,
                           half_mask=hs, packed_zmu=zmode)


def _fk_pair3_pallas(cst, patch, state2, tv2, sxy2, pts, n_k, rb,
                     zmode=True):
    import functools

    BP = patch.shape[0]
    ones2 = _half_ones3()
    return pl.pallas_call(
        functools.partial(_fk_pair3_kernel, n_k=n_k, zmode=zmode),
        grid=(BP // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, patch.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 36), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 384), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((384, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BP, 16), jnp.float32),
    )(cst, patch, state2, tv2, sxy2, pts, ones2)


def fk_step_pair3(cst, patch, state2, tv2, sxy2, pts, n_k: int = 4):
    """Pair3-packed fk_step: two trajectories per row over three registers
    (forward-only; the shooting planner never differentiates this path).

    cst: (18,) (pack_consts); patch: (BP, 512) = [w_A(256) | w_B(256)]
    packed bf16 [z|mu] windows (physics/fast._extract_windows_packed1,
    reshaped), BP = B/2; state2: (BP, 36); tv2: (BP, 16); sxy2: (BP, 4);
    pts: (8, 384) (pack_points_pair3).
    Returns (BP, 16) = two interleaved (B, 8) acceleration/stat vectors.
    """
    rb = _block_rows(patch.shape[0])
    if jax.default_backend() == "tpu" and rb:
        if rb > 256:
            rb = 256   # (rb, 384) planes: bound VMEM like packed single
        return _fk_pair3_pallas(cst, patch, state2, tv2, sxy2, pts, n_k, rb)
    return _fk_pair3_xla(cst, patch, state2, tv2, sxy2, pts, n_k)


def fk_step_pair3_zu(cst, patch, state2, tv2, sxy2, pts, n_k: int = 4):
    """Uniform-friction pair3 fk_step on z-PAIR packed windows: each window
    word holds bf16 [z(i,j) | z(i,j+1)], so TWO lane gathers (idx, idx+16)
    fetch all four bilinear taps — half the gather ladders of the [z|mu]
    layout — and friction is exactly 1.0 (the shooting planner's
    friction=None default, reference dphysics.py:561-563 with
    monoforce_ros/nodes/diff_physics.py:221-268 running without a friction
    layer).  z taps are the same bf16 values as the [z|mu] layout, so this
    path is numerically identical to fk_step_pair3 at friction == 1.

    patch: (BP, 512) = [zpair_A(256) | zpair_B(256)]
    (physics/fast._extract_windows_zpair); other args as fk_step_pair3.
    Returns (BP, 16).
    """
    rb = _block_rows(patch.shape[0])
    if jax.default_backend() == "tpu" and rb:
        if rb > 256:
            rb = 256
        return _fk_pair3_pallas(cst, patch, state2, tv2, sxy2, pts, n_k, rb,
                                zmode="zpair")
    return _fk_pair3_xla(cst, patch, state2, tv2, sxy2, pts, n_k,
                         zmode="zpair")


def fk_step_pair3_muq(cst, patch, state2, tv2, sxy2, pts, n_k: int = 4):
    """Non-uniform-friction pair3 fk_step at the gather information floor:
    THREE gathers per step instead of fk_step_pair3's four.  z rides the zu
    kernel's z-pair words ([z(i,j) | z(i,j+1)] bf16 — two gathers fetch all
    four bilinear taps) and one more gather fetches a friction QUAD word
    packing this cell's four mu taps as u8 (scale 1/64, TAP_OFFSETS order),
    applied with the exact reference bilinear weights (dphysics.py:231-235).

    Serving default for the fused monoforce node's flagship workload (0.1 m
    contact cloud WITH the predicted friction grid,
    monoforce_ros/nodes/monoforce_node.py:157-159).  Accuracy trades vs the
    exact path: the bf16 z taps (shared with every serving kernel) plus
    mu's u8 step (<=1/128 absolute — finer than pair mode's gated
    nearest-cell mu trade); fk_step_pair3 (exact bf16 bilinear mu) is the
    oracle in tests/test_fast.py::test_muq_*.

    patch: (BP, 1024) = [zpair_A(256) | muquad_A(256) | zpair_B | muquad_B]
    (physics/fast._extract_windows_zmuq, reshaped); other args as
    fk_step_pair3.  Returns (BP, 16).
    """
    rb = _block_rows(patch.shape[0])
    if jax.default_backend() == "tpu" and rb:
        if rb > 256:
            rb = 256
        return _fk_pair3_pallas(cst, patch, state2, tv2, sxy2, pts, n_k, rb,
                                zmode="muq")
    return _fk_pair3_xla(cst, patch, state2, tv2, sxy2, pts, n_k,
                         zmode="muq")


