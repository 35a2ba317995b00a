"""Independent numpy oracle for the rigid-body rollout semantics.

This is a from-the-spec reimplementation (plain numpy, one trajectory, explicit
time loop) used to validate the JAX engine.  It follows the behavioral spec of
the reference engine as documented in SURVEY.md §3.1 / the docstrings in
monoforce_tpu.physics.engine — soft sigmoid contact, spring-damper reaction
normalized by soft contact count and clamped to +-mg, slip-velocity friction,
clamped angular acceleration, semi-implicit Euler with Rodrigues rotation
update, settle-to-terrain init and equilibrium offset.
"""

import numpy as np


def interp(grid, xq, yq, d_max, res, normals=False):
    H, W = grid.shape
    flat = grid.reshape(-1)
    fx = (xq + d_max) / res
    fy = (yq + d_max) / res
    xi = fx.astype(np.int64)  # trunc toward zero
    yi = fy.astype(np.int64)
    xf = (fx - xi).astype(grid.dtype)
    yf = (fy - yi).astype(grid.dtype)
    hi = H * W - 1
    ic = np.clip(yi + H * xi, 0, hi)
    if_ = np.clip(yi + H * (xi + 1), 0, hi)
    il = np.clip(yi + 1 + H * xi, 0, hi)
    ifl = np.clip(yi + 1 + H * (xi + 1), 0, hi)
    zc, zf_, zl, zfl = flat[ic], flat[if_], flat[il], flat[ifl]
    # spec quirk: y_frac weights the +x tap, x_frac weights the +y tap
    z = (1 - xf) * (1 - yf) * zc + (1 - xf) * yf * zf_ + xf * (1 - yf) * zl + xf * yf * zfl
    if not normals:
        return z
    dzdx = (zf_ - zc) / res
    dzdy = (zl - zc) / res
    n = np.stack([-dzdx, -dzdy, np.ones_like(dzdx)], axis=-1)
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    return z, n


def inertia(mass, pts):
    mp = mass / len(pts)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    I = np.array([
        [np.sum(mp * (y * y + z * z)), -np.sum(mp * x * y), -np.sum(mp * x * z)],
        [-np.sum(mp * x * y), np.sum(mp * (x * x + z * z)), -np.sum(mp * y * z)],
        [-np.sum(mp * x * z), -np.sum(mp * y * z), np.sum(mp * (x * x + y * y))],
    ], dtype=pts.dtype)
    return I


def rodrigues(R, w, dt, eps=1e-6):
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]], dtype=R.dtype)
    Kn = K / max(th, eps)
    return R @ (np.eye(3, dtype=R.dtype) + Kn * np.sin(th * dt) + Kn @ Kn * (1 - np.cos(th * dt)))


def track_vels(v, w, Ly, K):
    vl, vr = v - w * Ly / 2, v + w * Ly / 2
    return np.array([vl, vr] * (K // 2), dtype=np.float32)


def joint_points(pts0, joint_angles, joint_positions, masks):
    pts = pts0.copy()
    for i in range(4):
        a = joint_angles[i]
        rot = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
                       dtype=pts.dtype)
        jp = joint_positions[i]
        sel = masks[i].astype(bool)
        pts[sel] = (pts[sel] - jp) @ rot.T + jp
    return pts


def oracle_rollout(pts, masks, mass, robot_size, z_grid, friction, controls,
                   state0, d_max, res, dt, stiffness, damping,
                   g=9.81, omega_max=2.0, joint_angles=None,
                   joint_positions=None, flippers=False, mode="euler"):
    """One trajectory. state0 = (x, xd, R, omega). Returns dict of stacked arrays."""
    dtype = np.float32
    pts = pts.astype(dtype)
    x, xd, R, omega = [np.array(s, dtype=dtype) for s in state0]
    N = controls.shape[0]
    K = masks.shape[0]
    Ly = robot_size[1]
    I_inv0 = np.linalg.inv(inertia(mass, pts))

    # settle
    pw = pts @ R.T + x
    x[2] = interp(z_grid, pw[:, 0], pw[:, 1], d_max, res).mean()

    Xs, Xds, Rs, Ws, Fs, Ff = [], [], [], [], [], []
    for t in range(N):
        ja = joint_angles[t] if joint_angles is not None else np.zeros(4, dtype)
        if flippers:
            pb = joint_points(pts, ja, joint_positions, masks)
            I_inv = np.linalg.inv(inertia(mass, pb))
        else:
            pb, I_inv = pts, I_inv0
        pw = pb @ R.T + x
        r = pw - x
        vp = xd + np.cross(omega, r)
        z, n = interp(z_grid, pw[:, 0], pw[:, 1], d_max, res, normals=True)
        mu = interp(friction, pw[:, 0], pw[:, 1], d_max, res)
        dh = pw[:, 2] - z
        contact = 1.0 / (1.0 + np.exp(10.0 * dh))
        vn = np.sum(vp * n, axis=-1)
        f_s = -(stiffness * dh + damping * vn)[:, None] * n
        f_s = f_s * contact[:, None] / contact.sum()
        f_s = np.clip(f_s, -mass * g, mass * g)
        thrust = R[:, 0] / max(np.linalg.norm(R[:, 0]), 1e-6)
        Nmag = np.linalg.norm(f_s, axis=-1)
        tv = track_vels(controls[t, 0], controls[t, 1], Ly, K)
        cmd = (masks.T.astype(dtype) @ tv)[:, None] * thrust[None, :]
        slip = mu[:, None] * (cmd - vp)
        slip_t = slip - np.sum(slip * n, axis=-1, keepdims=True) * n
        f_f = np.clip(Nmag[:, None] * slip_t, -mass * g, mass * g)
        tau = np.sum(np.cross(r, f_s + f_f), axis=0)
        wd = np.clip(I_inv @ tau, -omega_max, omega_max)
        xdd = (np.array([0, 0, -mass * g], dtype) + f_s.sum(0) + f_f.sum(0)) / mass

        # semi-implicit update
        xd = xd + xdd * dt
        x = x + xd * dt
        omega = omega + wd * dt
        R = rodrigues(R, omega, dt)
        Xs.append(x.copy()); Xds.append(xd.copy()); Rs.append(R.copy()); Ws.append(omega.copy())
        Fs.append(f_s); Ff.append(f_f)

    Xs = np.stack(Xs); Rs = np.stack(Rs)
    delta_h = mass * g / (stiffness + 1e-6)
    Xs = Xs + Rs[:, :, 2] * delta_h
    return dict(Xs=Xs, Xds=np.stack(Xds), Rs=Rs, Omegas=np.stack(Ws),
                F_springs=np.stack(Fs), F_frictions=np.stack(Ff))
