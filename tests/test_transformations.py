"""SE(3) helper tests against scipy."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

import pytest

from monoforce_tpu.transformations import (
    transform_cloud, xyz_rpy_to_matrix, rot2rpy, rpy2rot, pose_to_xyz_q,
    quat_to_rot, rot_to_quat,
)


def _rand_rot(seed=0):
    return Rotation.random(random_state=seed).as_matrix().astype(np.float32)



# whole module is part of the fast pre-commit smoke tier
pytestmark = pytest.mark.smoke

def test_rpy_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        rpy = rng.uniform(-1.2, 1.2, 3)
        R = rpy2rot(*rpy)
        expected = Rotation.from_euler("xyz", rpy).as_matrix()
        np.testing.assert_allclose(np.asarray(R), expected, atol=1e-5)
        back = rot2rpy(R)
        np.testing.assert_allclose(np.asarray(back), rpy, atol=1e-5)


def test_transform_cloud():
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = _rand_rot(1)
    T[:3, 3] = [1.0, -2.0, 0.5]
    pts = np.random.default_rng(2).normal(size=(50, 3)).astype(np.float32)
    ours = np.asarray(transform_cloud(jnp.asarray(pts), jnp.asarray(T)))
    expected = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_xyz_rpy_to_matrix():
    v = np.array([1.0, 2.0, 3.0, 0.1, -0.2, 0.3], np.float32)
    T = np.asarray(xyz_rpy_to_matrix(jnp.asarray(v)))
    expected = np.eye(4)
    expected[:3, :3] = Rotation.from_euler("xyz", v[3:]).as_matrix()
    expected[:3, 3] = v[:3]
    np.testing.assert_allclose(T, expected, atol=1e-5)


def test_quaternion_roundtrip():
    for seed in range(8):
        R = _rand_rot(seed)
        q = np.asarray(rot_to_quat(jnp.asarray(R)))
        q_scipy = Rotation.from_matrix(R).as_quat()
        # sign-ambiguous
        assert (np.allclose(q, q_scipy, atol=1e-4)
                or np.allclose(q, -q_scipy, atol=1e-4))
        R_back = np.asarray(quat_to_rot(jnp.asarray(q)))
        np.testing.assert_allclose(R_back, R, atol=1e-4)


def test_pose_to_xyz_q():
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = _rand_rot(5)
    T[:3, 3] = [4.0, 5.0, 6.0]
    out = np.asarray(pose_to_xyz_q(jnp.asarray(T)))
    np.testing.assert_allclose(out[:3], T[:3, 3], atol=1e-6)
    assert abs(np.linalg.norm(out[3:]) - 1) < 1e-5
