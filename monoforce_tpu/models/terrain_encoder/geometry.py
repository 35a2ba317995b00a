"""Camera frustum geometry for the lift step.

Reference parity: LiftSplatShoot.create_frustum / get_geometry
(reference: monoforce/src/monoforce/models/terrain_encoder/lss.py:191-224) and
gen_dx_bx (terrain_encoder/utils.py:136-141).

All functions are pure jnp; the frustum is a compile-time constant folded by
XLA (static image geometry).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["gen_dx_bx", "create_frustum", "get_geometry"]


def gen_dx_bx(xbound, ybound, zbound):
    """Grid cell sizes dx, first-cell centers bx, cell counts nx."""
    bounds = [xbound, ybound, zbound]
    dx = np.array([row[2] for row in bounds], dtype=np.float32)
    bx = np.array([row[0] + row[2] / 2.0 for row in bounds], dtype=np.float32)
    nx = np.array([(row[1] - row[0]) / row[2] for row in bounds]).astype(np.int64)
    return dx, bx, nx


def create_frustum(final_dim, dbound, downsample: int = 16):
    """(D, fH, fW, 3) frustum of (u, v, depth) samples in final-image pixels."""
    ogfH, ogfW = final_dim
    fH, fW = ogfH // downsample, ogfW // downsample
    ds = np.arange(*dbound, dtype=np.float32)
    D = ds.shape[0]
    xs = np.linspace(0, ogfW - 1, fW, dtype=np.float32)
    ys = np.linspace(0, ogfH - 1, fH, dtype=np.float32)
    frustum = np.stack(np.broadcast_arrays(
        xs[None, None, :], ys[None, :, None], ds[:, None, None]), axis=-1)
    return jnp.asarray(frustum)  # (D, fH, fW, 3)


def get_geometry(frustum, rots, trans, intrins, post_rots, post_trans):
    """Ego-frame (x, y, z) of every frustum sample.

    Args:
      frustum: (D, fH, fW, 3) pixel-space frustum.
      rots, intrins, post_rots: (B, N, 3, 3) camera rotations / intrinsics /
        image-aug rotations.
      trans, post_trans: (B, N, 3).

    Returns (B, N, D, fH, fW, 3).
    """
    B, N = trans.shape[:2]
    # undo the post-augmentation homography
    pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts)
    # pixel (u, v, d) -> camera ray (u*d, v*d, d)
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)
    combine = jnp.einsum("bnij,bnjk->bnik", rots, jnp.linalg.inv(intrins))
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts)
    return pts + trans[:, :, None, None, None, :]
