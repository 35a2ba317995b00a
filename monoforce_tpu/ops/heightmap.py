"""Point-cloud -> heightmap rasterization and related grid ops.

TPU-native equivalents of the reference cloud processing
(reference: monoforce/src/monoforce/cloudproc.py):

- ``estimate_heightmap`` (cloudproc.py:88-148): max-z rasterization onto the
  BEV grid.  The reference filters points with boolean masks (dynamic shapes)
  and uses ``scatter_reduce(amax)``; here invalid points are routed to a
  trash segment of a fixed-shape ``segment_max`` — jit/vmap friendly.  The
  final transpose quirk (cloudproc.py:142-144) is preserved: it is what makes
  the heightmap layout match the physics engine's ``i = y + H*x`` lookup.
- ``filter_grid`` (cloudproc.py:55-86): keep one point per cell
  (host-side numpy; a data-prep op, not a device op).
- ``hm_to_cloud`` (cloudproc.py:151-173): heightmap back to a point cloud.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["estimate_heightmap", "filter_grid", "hm_to_cloud",
           "inpaint_heightmap", "local_heightmap"]


def estimate_heightmap(points, grid_res: float, d_max: float, h_max: float,
                       r_min: float | None = None, h_min: float | None = None):
    """Rasterize a point cloud into a (2, H, W) heightmap + measurement mask.

    Args:
      points: (P, 3) xyz, NaNs allowed (ignored).
      grid_res, d_max, h_max: grid geometry; cells cover [-d_max, d_max).
      r_min: optional inner radius to drop robot-body returns.
      h_min: lower height bound (defaults to -h_max).

    Returns (2, H, W): channel 0 max-z per cell (0 where unmeasured),
    channel 1 the measurement mask.
    """
    points = jnp.asarray(points, jnp.float32)
    if h_min is None:
        h_min = -h_max
    x, y, z = points[:, 0], points[:, 1], points[:, 2]

    valid = ~jnp.isnan(points).any(axis=1)
    if r_min is not None:
        valid &= jnp.sqrt(x ** 2 + y ** 2) > r_min
    valid &= ((x > -d_max) & (x < d_max) & (y > -d_max) & (y < d_max)
              & (z > h_min) & (z < h_max))

    bins = jnp.arange(-d_max, d_max, grid_res, dtype=jnp.float32)
    n = bins.shape[0]
    xi = jnp.searchsorted(bins, x, side="right") - 1
    yi = jnp.searchsorted(bins, y, side="right") - 1
    flat = yi * n + xi
    flat = jnp.where(valid, jnp.clip(flat, 0, n * n - 1), n * n)  # trash bin

    zmax = jax.ops.segment_max(jnp.where(valid, z, -jnp.inf), flat,
                               num_segments=n * n + 1)[:-1]
    measured = zmax > -jnp.inf
    hm = jnp.where(measured, zmax, 0.0).reshape(n, n)
    mask = measured.reshape(n, n)
    # layout quirk preserved: transpose so that hm[x_idx, y_idx]
    return jnp.stack([hm.T, mask.T.astype(jnp.float32)], axis=0)


def filter_grid(points: np.ndarray, grid_res: float, keep: str = "first",
                rng: np.random.Generator | None = None) -> np.ndarray:
    """Keep a single point per grid cell (order not preserved). Host-side."""
    assert keep in ("first", "random", "last")
    pts = np.asarray(points)
    if keep == "random":
        rng = rng or np.random.default_rng(135)
        pts = pts[rng.permutation(len(pts))]
    elif keep == "last":
        pts = pts[::-1]
    keys = np.floor(pts[:, :3] / grid_res).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return pts[idx]


def hm_to_cloud(height, d_max: float, mask=None):
    """Heightmap (H, W) -> point cloud (H*W | mask.sum(), 3)."""
    H, W = height.shape
    xg = jnp.linspace(-d_max, d_max, H)
    yg = jnp.linspace(-d_max, d_max, W)
    gx, gy = jnp.meshgrid(xg, yg, indexing="ij")
    cloud = jnp.stack([gx, gy, height], axis=-1).reshape(-1, 3)
    if mask is not None:
        cloud = cloud[jnp.asarray(mask).reshape(-1).astype(bool)]
    return cloud


def inpaint_heightmap(hm, mask, iters: int = 16):
    """Fill unmeasured cells by iterative neighbor averaging (a jittable
    stand-in for the scipy ``griddata`` interpolation the reference's GT
    gridmap publisher uses, monoforce_navigation/nodes/
    publish_gt_gridmap:169-184)."""
    hm = jnp.asarray(hm, jnp.float32)
    m = jnp.asarray(mask, jnp.float32)

    def body(_, carry):
        h, w = carry
        hp = jnp.pad(h * w, 1)
        wp = jnp.pad(w, 1)
        num = (hp[:-2, 1:-1] + hp[2:, 1:-1] + hp[1:-1, :-2] + hp[1:-1, 2:])
        den = (wp[:-2, 1:-1] + wp[2:, 1:-1] + wp[1:-1, :-2] + wp[1:-1, 2:])
        fill = num / jnp.maximum(den, 1e-6)
        new_w = jnp.clip(w + (den > 0) * (1 - w), 0.0, 1.0)
        new_h = jnp.where(w > 0, h, fill)
        return (new_h, new_w)

    h, _ = jax.lax.fori_loop(0, iters, body, (hm, m))
    return h


def local_heightmap(cloud, robot_pose, grid_res: float, d_max: float,
                    h_max: float, inpaint_iters: int = 16):
    """Robot-centric heightmap from a global cloud: transform the cloud into
    the (yaw-only) robot frame, rasterize, inpaint gaps (the GT gridmap
    publisher pipeline, publish_gt_gridmap:105-244)."""
    cloud = jnp.asarray(cloud, jnp.float32)
    pose = jnp.asarray(robot_pose, jnp.float32)
    yaw = jnp.arctan2(pose[1, 0], pose[0, 0])
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    Rz = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    local = (cloud - pose[:3, 3]) @ Rz
    hm = estimate_heightmap(local, grid_res, d_max, h_max)
    return inpaint_heightmap(hm[0], hm[1], inpaint_iters)
