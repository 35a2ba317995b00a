"""Pinhole camera projection helpers (host-side numpy).

Reference parity: ego_to_cam / cam_to_ego / get_only_in_img_mask
(reference: monoforce/src/monoforce/models/terrain_encoder/utils.py:13-43).
Used by the dataset layer to paint lidar points with per-camera segmentation
labels (rough.py:545-601).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ego_to_cam", "cam_to_ego", "in_image_mask"]


def ego_to_cam(points: np.ndarray, rot: np.ndarray, trans: np.ndarray,
               intrins: np.ndarray) -> np.ndarray:
    """(3, N) ego points -> pixel coords (u, v, depth)."""
    p = rot.T @ (points - trans[:, None])
    p = intrins @ p
    out = p.copy()
    out[:2] /= p[2:3]
    return out


def cam_to_ego(points: np.ndarray, rot: np.ndarray, trans: np.ndarray,
               intrins: np.ndarray) -> np.ndarray:
    """(3, N) pixel (u, v, depth) -> ego frame."""
    p = np.concatenate([points[:2] * points[2:3], points[2:3]], axis=0)
    p = np.linalg.inv(intrins) @ p
    return rot @ p + trans[:, None]


def in_image_mask(pts: np.ndarray, H: int, W: int) -> np.ndarray:
    """Mask of projected points with positive depth inside the image."""
    return ((pts[2] > 0)
            & (pts[0] > 1) & (pts[0] < W - 1)
            & (pts[1] > 1) & (pts[1] < H - 1))
