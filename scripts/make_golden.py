"""Generate golden trajectories from the REAL reference PyTorch engine.

Runs the reference ``DPhysics.dynamics()`` euler integrator (reference:
monoforce/src/monoforce/models/traj_predictor/dphysics.py:467-497 via
``dphysics()`` dphysics.py:530-594) with THIS repo's exact robot point
clouds / driving masks injected, and saves the resulting state + force
trajectories as ``tests/golden/*.npz``.  ``tests/test_golden.py`` then gates
``monoforce_tpu.physics.engine`` (and the fast path) against these files —
upgrading every parity claim from "my oracle agrees with me" to "the
reference agrees with me".

Two integrator families are driven, because the reference has two:
``dynamics()`` (semi-implicit euler, dphysics.py:467-497 — the path its
``integration_mode='euler'`` naming suggests) and the actual DEFAULT
``dynamics_odeint`` (``use_odeint=True`` per dphys_config.py:153 —
fully-explicit euler over the extended state via torchdiffeq,
dphysics.py:499-528).  torchdiffeq and open3d are not installed:
``ref_loader`` stubs open3d (mesh loader replaced by our procedural clouds)
and substitutes an exact fixed-grid euler shim for ``torchdiffeq.odeint``.

Usage:  python scripts/make_golden.py  [--out tests/golden]
"""

from __future__ import annotations

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/monoforce/src"
sys.path.insert(0, REPO)

# ---------------------------------------------------------------------------
# Import the reference engine through the SAME loader the head-to-head tests
# use (tests/ref_loader.py): identical stubs + identical injected point
# clouds, so golden generation and the parity tests can never diverge.
# ---------------------------------------------------------------------------

def _import_reference():
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ref_loader import load_reference_dphysics
    return load_reference_dphysics()


# ---------------------------------------------------------------------------
# Deterministic terrains (numpy only, no RNG needed for reproducibility).
# ---------------------------------------------------------------------------

def make_terrains(x_grid: np.ndarray, y_grid: np.ndarray) -> dict:
    X, Y = x_grid, y_grid
    flat = np.zeros_like(X)
    hill = 0.6 * np.exp(-((X - 1.5) ** 2 + Y ** 2) / 1.5)
    step = 0.3 * (X > 1.0).astype(np.float32)
    sine = (0.15 * np.sin(1.7 * X) * np.cos(1.3 * Y)
            + 0.08 * np.sin(3.1 * X + 0.5) * np.sin(2.3 * Y + 1.0))
    return {
        "flat": flat.astype(np.float32),
        "hill": hill.astype(np.float32),
        "step": step.astype(np.float32),
        "sine": sine.astype(np.float32),
    }


def make_controls(n_ts: int, dt: float) -> np.ndarray:
    """(B=4, N, 2) controls: three constant (v, w) pairs + one time-varying."""
    t = np.arange(n_ts) * dt
    rows = [
        np.stack([np.full(n_ts, 1.0), np.full(n_ts, 0.0)], axis=-1),
        np.stack([np.full(n_ts, 0.8), np.full(n_ts, 0.5)], axis=-1),
        np.stack([np.full(n_ts, -0.5), np.full(n_ts, -0.3)], axis=-1),
        np.stack([0.9 * np.sin(0.8 * t) + 0.1, 0.6 * np.cos(1.1 * t)], axis=-1),
    ]
    return np.stack(rows).astype(np.float32)


def make_joint_angles(n_ts: int, dt: float, batch: int) -> np.ndarray:
    """(B, N, 4) time-varying flipper angles [fl, fr, rl, rr]."""
    t = np.arange(n_ts) * dt
    base = np.stack([
        0.4 * np.sin(0.9 * t),
        -0.3 * np.sin(0.9 * t + 0.4),
        0.2 * (1.0 - np.cos(0.7 * t)),
        -0.25 * (1.0 - np.cos(0.7 * t + 0.2)),
    ], axis=-1)
    out = np.stack([base * (0.5 + 0.25 * b) for b in range(batch)])
    return out.astype(np.float32)


FORCE_STRIDE = 25  # save forces every k-th step to keep files small


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "golden"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    torch, ref_cfg_mod, ref_dphys_mod = _import_reference()
    torch.manual_seed(0)

    cases = []
    for robot in ("tradr", "marv"):
        cfg = ref_cfg_mod.DPhysConfig(robot=robot)
        cfg.use_odeint = False           # euler parity target
        cfg.integration_mode = "euler"
        engine = ref_dphys_mod.DPhysics(cfg, device="cpu")

        x_grid = cfg.x_grid.numpy()
        y_grid = cfg.y_grid.numpy()
        terrains = make_terrains(x_grid, y_grid)
        n_ts = int(cfg.traj_sim_time / cfg.dt)
        controls = make_controls(n_ts, cfg.dt)
        B = controls.shape[0]
        joint_angles = (make_joint_angles(n_ts, cfg.dt, B)
                        if robot == "marv" else None)

        for tname, z in terrains.items():
            frictions = {"": None}
            if robot == "tradr" and tname == "hill":
                # spatially-varying friction gradient 0.3 .. 1.2 along x
                fr = (0.3 + 0.9 * (x_grid - x_grid.min())
                      / (x_grid.max() - x_grid.min()))
                frictions["_frgrad"] = fr.astype(np.float32)
            for suffix, fr in frictions.items():
                z_t = torch.as_tensor(z)[None].repeat(B, 1, 1)
                ctrl_t = torch.as_tensor(controls)
                ja_t = (torch.as_tensor(joint_angles)
                        if joint_angles is not None else None)
                fr_t = (torch.as_tensor(fr)[None].repeat(B, 1, 1)
                        if fr is not None else None)
                with torch.no_grad():
                    states, forces = engine.dphysics(
                        z_grid=z_t, controls=ctrl_t,
                        joint_angles=ja_t, friction=fr_t)
                Xs, Xds, Rs, Omegas = [s.numpy() for s in states]
                F_spring, F_friction = [f.numpy() for f in forces]
                name = f"{robot}_{tname}{suffix}"
                path = os.path.join(args.out, name + ".npz")
                np.savez_compressed(
                    path,
                    robot=robot,
                    robot_points=cfg.robot_points.numpy().astype(np.float32),
                    z_grid=z.astype(np.float32),
                    friction=(fr if fr is not None else np.array([])),
                    controls=controls,
                    joint_angles=(joint_angles if joint_angles is not None
                                  else np.array([])),
                    Xs=Xs.astype(np.float32),
                    Xds=Xds.astype(np.float32),
                    Rs=Rs.astype(np.float32),
                    Omegas=Omegas.astype(np.float32),
                    F_spring=F_spring[:, ::FORCE_STRIDE].astype(np.float32),
                    F_friction=F_friction[:, ::FORCE_STRIDE].astype(np.float32),
                    force_stride=FORCE_STRIDE,
                )
                sz = os.path.getsize(path) / 1e6
                print(f"wrote {path}  Xs={Xs.shape}  ({sz:.2f} MB)")
                cases.append(name)

    # ------------------------------------------------------------------
    # The reference's DEFAULT integrator: use_odeint=True (dphys_config.py:153)
    # -> dynamics_odeint (dphysics.py:499-528): torchdiffeq.odeint(method=
    # 'euler') over forward_kinematics_extended_state — FULLY-explicit Euler
    # on the ts grid (torchdiffeq is stubbed by ref_loader with an exact
    # fixed-grid euler shim).  Quirks captured by these cases: output row 0
    # is the initial state; the effective step is T/(int(T/dt)-1) from
    # linspace (dphysics.py:167), not cfg.dt; R integrates LINEARLY
    # (R += dt*[w]x R, drifting off SO(3)); and the force slots are
    # INTEGRATED (F_out[k] = sum_{j<k} dt*F(t_j)), not instantaneous.
    # ------------------------------------------------------------------
    for robot, tname in [("tradr", "flat"), ("tradr", "hill"),
                         ("tradr", "sine"), ("marv", "hill")]:
        cfg = ref_cfg_mod.DPhysConfig(robot=robot)
        cfg.use_odeint = True            # the reference DEFAULT path
        cfg.integration_mode = "euler"
        engine = ref_dphys_mod.DPhysics(cfg, device="cpu")

        x_grid = cfg.x_grid.numpy()
        y_grid = cfg.y_grid.numpy()
        z = make_terrains(x_grid, y_grid)[tname]
        n_ts = int(cfg.traj_sim_time / cfg.dt)
        controls = make_controls(n_ts, cfg.dt)
        B = controls.shape[0]
        joint_angles = (make_joint_angles(n_ts, cfg.dt, B)
                        if robot == "marv" else None)

        z_t = torch.as_tensor(z)[None].repeat(B, 1, 1)
        ctrl_t = torch.as_tensor(controls)
        ja_t = (torch.as_tensor(joint_angles)
                if joint_angles is not None else None)
        with torch.no_grad():
            states, forces = engine.dphysics(
                z_grid=z_t, controls=ctrl_t, joint_angles=ja_t)
        Xs, Xds, Rs, Omegas = [s.numpy() for s in states]
        F_spring, F_friction = [f.numpy() for f in forces]
        name = f"{robot}_{tname}_odeint"
        path = os.path.join(args.out, name + ".npz")
        np.savez_compressed(
            path,
            robot=robot,
            odeint=np.array(1),
            robot_points=cfg.robot_points.numpy().astype(np.float32),
            z_grid=z.astype(np.float32),
            friction=np.array([]),
            controls=controls,
            joint_angles=(joint_angles if joint_angles is not None
                          else np.array([])),
            Xs=Xs.astype(np.float32),
            Xds=Xds.astype(np.float32),
            Rs=Rs.astype(np.float32),
            Omegas=Omegas.astype(np.float32),
            F_spring=F_spring[:, ::FORCE_STRIDE].astype(np.float32),
            F_friction=F_friction[:, ::FORCE_STRIDE].astype(np.float32),
            force_stride=FORCE_STRIDE,
        )
        sz = os.path.getsize(path) / 1e6
        print(f"wrote {path}  Xs={Xs.shape}  ({sz:.2f} MB)")
        cases.append(name)

    print(f"\n{len(cases)} golden cases: {cases}")


if __name__ == "__main__":
    main()
