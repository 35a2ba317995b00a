"""Golden parity: the jax engine vs trajectories from the REAL reference
PyTorch engine.

``tests/golden/*.npz`` is produced by ``scripts/make_golden.py``, which runs
BOTH reference integrators with this repo's exact robot point clouds
injected: the semi-implicit ``DPhysics.dynamics()`` (dphysics.py:467-497)
and the reference-DEFAULT ``dynamics_odeint`` (``use_odeint=True``,
dphys_config.py:153; fully-explicit euler, dphysics.py:499-528 — the
``*_odeint`` cases).  These tests gate the exact engine (``physics/engine.py``
``rollout`` / ``rollout_odeint``) and the production fast path
(``physics/fast.py``) at trajectory-RMSE < 1e-3 against the reference
(BASELINE.md config #1).
"""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RobotModel, rollout, rollout_odeint
from monoforce_tpu.physics.fast import fast_rollout

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
ALL_CASES = sorted(os.path.basename(p)[:-4]
                   for p in glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))
CASES = [c for c in ALL_CASES if "odeint" not in c]
ODEINT_CASES = [c for c in ALL_CASES if "odeint" in c]

# Trajectory-level parity gate (BASELINE.md config #1): < 1e-3 position RMSE.
X_RMSE = 1e-3
R_RMSE = 5e-3    # rotation-matrix entries, radians-scale drift
XD_RMSE = 2e-2   # impact velocities are the noisiest signal
F_RTOL = 0.05    # forces at strided steps, relative to peak magnitude


def _load(name):
    d = np.load(os.path.join(GOLDEN_DIR, name + ".npz"))
    robot = str(d["robot"])
    # Pin the exact contact cloud the reference engine ran with (the golden
    # generator uses voxel 0.1 like dphys_config.py:8; the repo default is a
    # coarser production setting).
    cfg = PhysicsConfig(robot=robot, robot_points=d["robot_points"])
    model = RobotModel.from_config(cfg)
    B = d["controls"].shape[0]
    z = jnp.asarray(np.broadcast_to(d["z_grid"], (B,) + d["z_grid"].shape))
    fr = None
    if d["friction"].size:
        fr = jnp.asarray(np.broadcast_to(d["friction"],
                                         (B,) + d["friction"].shape))
    ja = jnp.asarray(d["joint_angles"]) if d["joint_angles"].size else None
    return d, model, z, jnp.asarray(d["controls"]), ja, fr


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


@pytest.mark.parametrize("name", CASES)
def test_engine_matches_reference(name):
    d, model, z, ctr, ja, fr = _load(name)
    states, forces, _ = rollout(model, z, ctr, joint_angles=ja, friction=fr,
                                return_forces=True)
    assert _rmse(states.x, d["Xs"]) < X_RMSE, name
    assert _rmse(states.R, d["Rs"]) < R_RMSE, name
    assert _rmse(states.xd, d["Xds"]) < XD_RMSE, name
    # forces at strided steps — scale-relative (peak spring force ~ m*g)
    k = int(d["force_stride"])
    fs, ff = forces
    peak = float(np.abs(d["F_spring"]).max()) + 1e-6
    assert _rmse(np.asarray(fs)[:, ::k], d["F_spring"]) / peak < F_RTOL, name
    assert _rmse(np.asarray(ff)[:, ::k], d["F_friction"]) / peak < F_RTOL, name


@pytest.mark.parametrize("name", CASES)
def test_fast_matches_reference(name):
    """The production fast path holds the same trajectory gate vs the real
    reference — including the marv cases, whose golden controls come with
    time-varying flipper articulation."""
    d, model, z, ctr, ja, fr = _load(name)
    states, _ = fast_rollout(model, z, ctr, joint_angles=ja, friction=fr)
    assert _rmse(states.x, d["Xs"]) < X_RMSE, name
    assert _rmse(states.R, d["Rs"]) < R_RMSE, name
    assert _rmse(states.xd, d["Xds"]) < XD_RMSE, name


@pytest.mark.parametrize("name", ODEINT_CASES)
def test_odeint_matches_reference(name):
    """``rollout_odeint`` vs the reference's DEFAULT integrator path
    (``use_odeint=True`` -> torchdiffeq euler; goldens driven through an
    exact fixed-grid euler shim, see tests/ref_loader.py).  The force
    channels here are the odeint path's INTEGRATED forces (impulses)."""
    d, model, z, ctr, ja, fr = _load(name)
    cfg_T, n = 5.0, ctr.shape[1]
    dt_eff = cfg_T / (n - 1)  # linspace(0, T, int(T/dt)) spacing
    states, forces = rollout_odeint(model, z, ctr, joint_angles=ja,
                                    friction=fr, dt=dt_eff)
    assert _rmse(states.x, d["Xs"]) < X_RMSE, name
    assert _rmse(states.R, d["Rs"]) < R_RMSE, name
    assert _rmse(states.xd, d["Xds"]) < XD_RMSE, name
    k = int(d["force_stride"])
    fs, ff = forces
    peak = float(np.abs(d["F_spring"]).max()) + 1e-6
    assert _rmse(np.asarray(fs)[:, ::k], d["F_spring"]) / peak < F_RTOL, name
    assert _rmse(np.asarray(ff)[:, ::k], d["F_friction"]) / peak < F_RTOL, name


@pytest.mark.smoke
def test_smoke_golden_one_case():
    """Smoke tier: one golden parity case against the real reference engine
    (the full 13-case sweep runs in the nightly suite)."""
    test_engine_matches_reference("tradr_hill")


@pytest.mark.smoke
def test_golden_dataset_present():
    """The golden set covers both robots, 4+ terrains each, and both
    reference integrators."""
    assert len(CASES) >= 8, CASES
    assert any("marv" in c for c in CASES)
    assert any("frgrad" in c for c in CASES)
    assert len(ODEINT_CASES) >= 4 and any("marv" in c for c in ODEINT_CASES)


def test_integrator_divergence_is_real():
    """The two reference integrators genuinely differ (O(dt) per step —
    semi-implicit vs fully-explicit, Rodrigues vs linear R update): the
    divergence between the euler and odeint goldens is orders of magnitude
    above the parity gate, so gating each path separately is load-bearing,
    not redundant.  Measured values are recorded in PARITY.md."""
    d_e = np.load(os.path.join(GOLDEN_DIR, "tradr_hill.npz"))
    d_o = np.load(os.path.join(GOLDEN_DIR, "tradr_hill_odeint.npz"))
    div = float(np.sqrt(np.mean((d_e["Xs"] - d_o["Xs"]) ** 2)))
    assert div > 10 * X_RMSE, div
