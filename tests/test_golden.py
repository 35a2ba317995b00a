"""Golden parity: the jax engine vs trajectories from the REAL reference
PyTorch engine.

``tests/golden/*.npz`` is produced by ``scripts/make_golden.py``, which runs
the reference ``DPhysics.dynamics()`` euler integrator (reference:
dphysics.py:467-497, driven via dphysics.py:530-594) with this repo's exact
robot point clouds injected.  These tests gate both the exact engine
(``physics/engine.py``) and the production fast path (``physics/fast.py``)
at trajectory-RMSE < 1e-3 against the reference (BASELINE.md config #1).
"""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RobotModel, rollout
from monoforce_tpu.physics.fast import fast_rollout

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASES = sorted(os.path.basename(p)[:-4]
               for p in glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))

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


@pytest.mark.parametrize("name", [c for c in CASES if "marv" not in c])
def test_fast_matches_reference(name):
    """The production fast path holds the same trajectory gate vs the real
    reference (tradr; marv articulation in fast path covered separately)."""
    d, model, z, ctr, ja, fr = _load(name)
    states, _ = fast_rollout(model, z, ctr, friction=fr)
    assert _rmse(states.x, d["Xs"]) < X_RMSE, name
    assert _rmse(states.R, d["Rs"]) < R_RMSE, name
    assert _rmse(states.xd, d["Xds"]) < XD_RMSE, name


def test_golden_dataset_present():
    """The golden set covers both robots and 4+ terrains each."""
    assert len(CASES) >= 8, CASES
    assert any("marv" in c for c in CASES)
    assert any("frgrad" in c for c in CASES)
