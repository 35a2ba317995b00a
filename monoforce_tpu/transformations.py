"""SE(3) helpers.

Reference parity: monoforce/src/monoforce/transformations.py — cloud
transforms, xyz+rpy <-> matrix conversions, pose -> xyz+quaternion.  Pure jnp
(vmap/jit friendly); no scipy dependency on the device path.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "transform_cloud", "xyz_rpy_to_matrix", "rot2rpy", "rpy2rot",
    "pose_to_xyz_q", "quat_to_rot", "rot_to_quat",
]


def transform_cloud(cloud, Tr):
    """(N, 3) points through a (4, 4) homogeneous transform."""
    return cloud @ Tr[:3, :3].T + Tr[:3, 3]


def rot2rpy(R):
    """Rotation matrix (..., 3, 3) -> (roll, pitch, yaw)."""
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    pitch = jnp.arctan2(-R[..., 2, 0],
                        jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def rpy2rot(roll, pitch, yaw):
    """Euler xyz angles -> rotation matrix R = Rz @ Ry @ Rx."""
    roll, pitch, yaw = [jnp.asarray(a) for a in (roll, pitch, yaw)]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack([
        jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
        jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
        jnp.stack([-sp, cp * sr, cp * cr], -1),
    ], -2)


def xyz_rpy_to_matrix(xyz_rpy):
    """(6,) [x y z roll pitch yaw] -> (4, 4)."""
    T = jnp.eye(4, dtype=jnp.result_type(xyz_rpy, jnp.float32))
    T = T.at[:3, :3].set(rpy2rot(xyz_rpy[3], xyz_rpy[4], xyz_rpy[5]))
    return T.at[:3, 3].set(xyz_rpy[:3])


def rot_to_quat(R):
    """(3, 3) rotation -> (x, y, z, w) quaternion (scipy convention),
    numerically-stable branch-free (Shepperd via jnp.where)."""
    m00, m11, m22 = R[0, 0], R[1, 1], R[2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions
    qw = jnp.sqrt(jnp.maximum(1 + tr, 0.0)) / 2
    qx = jnp.sqrt(jnp.maximum(1 + m00 - m11 - m22, 0.0)) / 2
    qy = jnp.sqrt(jnp.maximum(1 - m00 + m11 - m22, 0.0)) / 2
    qz = jnp.sqrt(jnp.maximum(1 - m00 - m11 + m22, 0.0)) / 2
    qx = jnp.copysign(qx, R[2, 1] - R[1, 2])
    qy = jnp.copysign(qy, R[0, 2] - R[2, 0])
    qz = jnp.copysign(qz, R[1, 0] - R[0, 1])
    q = jnp.stack([qx, qy, qz, qw])
    return q / jnp.linalg.norm(q)


def quat_to_rot(q):
    """(x, y, z, w) quaternion -> (3, 3) rotation."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.array([
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)],
    ])


def pose_to_xyz_q(pose):
    """(4, 4) pose -> (7,) [xyz, quat_xyzw]."""
    return jnp.concatenate([pose[:3, 3], rot_to_quat(pose[:3, :3])])
