#!/usr/bin/env python
"""Ablation attribution for the pair3 fk_step kernel on the TPU.

Times the kernel with sections progressively stubbed (outputs replaced by
cheap same-shape planes so downstream structure is preserved), reporting
the marginal cost of each section.  Methodology as scripts/kbench.py.
"""

import argparse
import functools
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RobotModel
from monoforce_tpu.ops import fk_step_pallas as K
from monoforce_tpu.ops.interp_pallas import TAP_OFFSETS
from monoforce_tpu.ops.fk_step_pallas import (
    _C_DMAX, _C_RES, _C_STIFF, _C_DAMP, _C_MASS, _C_G, _C_NREAL, _C_OMAX,
    _C_I00, _C_I01, _C_I02, _C_I11, _C_I12, _C_I22, _C_GD0, _C_GD1, _C_GD2,
    _gather384, _half_ones3, _mxu_reduce_halves, _unpack_hi, _unpack_lo,
)

B = 4096
N_CALLS = 2000


def _step_ablate(cst, patch, state2, tv2, sxy2, pts, gather2, reduce_halves,
                 hs, ab):
    """_step_math_pair (packed_zmu) with sections stubbable via ``ab``."""
    if "empty" in ab:
        return patch[:, 0:16] + state2[:, 0:16]
    d_max = cst[_C_DMAX]
    res = cst[_C_RES]
    stiff = cst[_C_STIFF]
    damp = cst[_C_DAMP]
    m = cst[_C_MASS]
    g = cst[_C_G]
    n_real = cst[_C_NREAL]

    if "selects" in ab:
        def sel(arr, col, off):
            return arr[:, col:col + 1]
    else:
        def sel(arr, col, off):
            return jnp.where(hs, arr[:, col:col + 1],
                             arr[:, col + off:col + off + 1])

    st = [sel(state2, j, 18) for j in range(18)]
    (x0, x1, x2, v0, v1, v2,
     r00, r01, r02, r10, r11, r12, r20, r21, r22, w0, w1, w2) = st

    px = pts[0:1, :]
    py = pts[1:2, :]
    pz = pts[2:3, :]
    maskv = pts[3:4, :]

    if "linear" in ab:
        rx = px + x0 * 0.0
        ry = py
        rz = pz
        wx = rx + x0
        wy = ry + x1
        wz = rz + x2
        vx = rx * 0.1
        vy = ry * 0.1
        vz = rz * 0.1
    else:
        rx = r00 * px + r01 * py + r02 * pz
        ry = r10 * px + r11 * py + r12 * pz
        rz = r20 * px + r21 * py + r22 * pz
        wx = rx + x0
        wy = ry + x1
        wz = rz + x2
        vx = v0 + w1 * rz - w2 * ry
        vy = v1 + w2 * rx - w0 * rz
        vz = v2 + w0 * ry - w1 * rx

    if "lookup" in ab:
        tz = [wx * 0.01 + off * 1e-3 for off in TAP_OFFSETS]
        tf = [wy * 0.01 + off * 1e-3 for off in TAP_OFFSETS]
        xf = wx - jnp.floor(wx)
        yf = wy - jnp.floor(wy)
    elif "gatheronly" in ab:
        idx = jnp.clip((wx * 37.0).astype(jnp.int32), 0, 238)
        xf = wx - jnp.floor(wx)
        yf = wy - jnp.floor(wy)
        tw = [gather2(patch, 0, idx + off) for off in TAP_OFFSETS]
        tz = [_unpack_hi(w) for w in tw]
        tf = [_unpack_lo(w) for w in tw]
    else:
        if "recip" in ab:
            inv_res = 1.0 / res
            fxq = (wx + d_max) * inv_res
            fyq = (wy + d_max) * inv_res
        else:
            fxq = (wx + d_max) / res
            fyq = (wy + d_max) / res
        xi = fxq.astype(jnp.int32)
        yi = fyq.astype(jnp.int32)
        xf = fxq - xi.astype(jnp.float32)
        yf = fyq - yi.astype(jnp.float32)
        sx = sel(sxy2, 0, 2).astype(jnp.int32)
        sy = sel(sxy2, 1, 2).astype(jnp.int32)
        xl = jnp.clip(xi - sx, 0, 14)
        yl = jnp.clip(yi - sy, 0, 14)
        idx = xl * 16 + yl
        tw = [gather2(patch, 0, idx + off) for off in TAP_OFFSETS]
        tz = [_unpack_hi(w) for w in tw]
        tf = [_unpack_lo(w) for w in tw]
    w_cc = (1 - xf) * (1 - yf)
    w_cf = (1 - xf) * yf
    w_lc = xf * (1 - yf)
    w_fl = xf * yf
    mu = w_cc * tf[0] + w_cf * tf[1] + w_lc * tf[2] + w_fl * tf[3]
    z = w_cc * tz[0] + w_cf * tz[1] + w_lc * tz[2] + w_fl * tz[3]
    if "normals" in ab:
        nx = z * 0.01
        ny = z * 0.01
        nz = 1.0 - z * 0.0
    else:
        dz_dx = (tz[1] - tz[0]) / res
        dz_dy = (tz[2] - tz[0]) / res
        ninv = lax.rsqrt(dz_dx * dz_dx + dz_dy * dz_dy + 1.0)
        nx = -dz_dx * ninv
        ny = -dz_dy * ninv
        nz = ninv

    dh = wz - z
    if "contact" in ab:
        contact = maskv * dh
        ((ncp_a, ncp_b),) = reduce_halves([contact])
        n_cp = jnp.where(hs, ncp_a, ncp_b)
        cs = contact
    else:
        if "sigmoid" in ab:
            contact = maskv * jax.nn.sigmoid(-10.0 * dh)
        else:
            contact = maskv / (1.0 + jnp.exp(10.0 * dh))
        vn = vx * nx + vy * ny + vz * nz
        scale = -(stiff * dh + damp * vn)
        ((ncp_a, ncp_b),) = reduce_halves([contact])
        n_cp = jnp.where(hs, ncp_a, ncp_b)
        cs = scale * contact / jnp.where(n_cp > 0, n_cp, 1.0)
    mg = m * g
    if "spring" in ab:
        fsx = cs * nx
        fsy = cs * ny
        fsz = cs * nz
        spring_mag = fsx + fsy
    else:
        fsx = jnp.clip(cs * nx, -mg, mg)
        fsy = jnp.clip(cs * ny, -mg, mg)
        fsz = jnp.clip(cs * nz, -mg, mg)
        spring_mag = jnp.sqrt(fsx * fsx + fsy * fsy + fsz * fsz + 1e-30)

    if "friction" in ab:
        ffx = mu * vx
        ffy = mu * vy
        ffz = mu * vz
    else:
        tn = lax.rsqrt(jnp.maximum(r00 * r00 + r10 * r10 + r20 * r20, 1e-12))
        t0 = r00 * tn
        t1 = r10 * tn
        t2 = r20 * tn
        cmd = sel(tv2, 0, 8) * pts[4:5, :]
        for k in range(1, 2):
            cmd = cmd + sel(tv2, k, 8) * pts[4 + k:5 + k, :]
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
    if "torque" in ab:
        tq0p, tq1p, tq2p = fx_, fy_, fz_
    else:
        tq0p = ry * fz_ - rz * fy_
        tq1p = rz * fx_ - rx * fz_
        tq2p = rx * fy_ - ry * fx_
    reduced = reduce_halves([tq0p, tq1p, tq2p, fx_, fy_, fz_, spring_mag,
                             spring_mag * spring_mag])

    if "tail" in ab:
        cols = [r[h] for r in reduced for h in range(2)]
        return jnp.concatenate(cols[:14] + [ncp_a, ncp_b], axis=1)
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
    if "integ" in ab:
        # in-kernel semi-implicit Euler + Rodrigues on the pair columns
        dt = 0.01
        accs = jnp.concatenate(halves, axis=1)
        outs = []
        for off, aoff in ((0, 0), (18, 8)):
            st = state2[:, off:off + 18]
            acc = accs[:, aoff:aoff + 8]
            vel = st[:, 3:6] + acc[:, 0:3] * dt
            xn = st[:, 0:3] + vel * dt
            wn = st[:, 15:18] + acc[:, 3:6] * dt
            theta = jnp.sqrt(jnp.sum(wn * wn, axis=1, keepdims=True))
            kv = wn / jnp.maximum(theta, 1e-6)
            s = jnp.sin(theta * dt)
            c1 = 1.0 - jnp.cos(theta * dt)
            k0 = kv[:, 0:1]
            k1 = kv[:, 1:2]
            k2 = kv[:, 2:3]
            r = st[:, 6:15]
            M = [1.0 + c1 * (-(k1 * k1 + k2 * k2)), -k2 * s + c1 * k0 * k1,
                 k1 * s + c1 * k0 * k2,
                 k2 * s + c1 * k0 * k1, 1.0 + c1 * (-(k0 * k0 + k2 * k2)),
                 -k0 * s + c1 * k1 * k2,
                 -k1 * s + c1 * k0 * k2, k0 * s + c1 * k1 * k2,
                 1.0 + c1 * (-(k0 * k0 + k1 * k1))]
            rn = []
            for i in range(3):
                for j in range(3):
                    rn.append(r[:, 3 * i:3 * i + 1] * M[j]
                              + r[:, 3 * i + 1:3 * i + 2] * M[3 + j]
                              + r[:, 3 * i + 2:3 * i + 3] * M[6 + j])
            outs.append(jnp.concatenate([xn, vel] + rn + [wn], axis=1))
        return (outs[0] + outs[1])[:, :16]
    return jnp.concatenate(halves, axis=1)


def _kernel(cst_ref, patch_ref, state_ref, tv_ref, sxy_ref, pts_ref,
            ones_ref, out_ref, *, ab):
    patch = patch_ref[:]
    rb = patch.shape[0]
    ones2 = ones_ref[:]
    hs = jax.lax.broadcasted_iota(jnp.int32, (rb, 384), 1) < 192
    out_ref[:] = _step_ablate(
        cst_ref, patch, state_ref[:], tv_ref[:], sxy_ref[:], pts_ref[:],
        gather2=lambda p, b, it: _gather384(p, it, rb),
        reduce_halves=lambda planes: _mxu_reduce_halves(planes, ones2),
        hs=hs, ab=ab)


def call_ablated(cst, patch, state2, tv2, sxy2, pts, ab, rb=256):
    BP = patch.shape[0]
    ones2 = _half_ones3()
    return pl.pallas_call(
        functools.partial(_kernel, ab=ab),
        grid=(BP // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=N_CALLS)
    ap.add_argument("--rb", type=int, default=256)
    ap.add_argument("--variants", type=str, default="")
    args = ap.parse_args()

    cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=0.1)
    robot = RobotModel.from_config(cfg)
    cst = K.pack_consts(robot)
    pts = K.pack_points_pair3(robot)

    key = jax.random.PRNGKey(0)
    BP = B // 2
    patch = jax.random.normal(key, (BP, 512), jnp.float32) * 0.1
    state2 = jnp.tile(jnp.asarray(
        [0, 0, 0.2, 0.5, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0.1] * 2,
        jnp.float32), (BP, 1))
    tv2 = jnp.tile(jnp.asarray(([0.5, 0.4] + [0.0] * 6) * 2, jnp.float32),
                   (BP, 1))
    sxy2 = jnp.tile(jnp.asarray([50.0, 50.0] * 2, jnp.float32), (BP, 1))

    def timed(name, ab):
        @jax.jit
        def many(p, s):
            def body(carry, i):
                acc, sc = carry
                out = call_ablated(cst, p, sc, tv2, sxy2, pts, ab, args.rb)
                return (acc + out.sum(), sc + out[:, :1] * 1e-12), ()
            return lax.scan(body, (0.0, s), jnp.arange(args.calls))[0][0]

        np.asarray(many(patch, state2))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(patch, state2))
            ts.append(time.perf_counter() - t0)
        per = min(ts) * 1e6 / args.calls
        print(f"{name:40s} {per:8.1f} us/call", flush=True)
        return per

    import sys
    names = sys.argv[0:0] or None
    variants = args.variants.split(",") if args.variants else ["full"]
    base = None
    for v in variants:
        ab = frozenset(x for x in v.split("+") if x and x != "full")
        t = timed(v, ab)
        if base is None:
            base = t
        else:
            print(f"    delta vs first: {base - t:+7.1f} us")


if __name__ == "__main__":
    main()
