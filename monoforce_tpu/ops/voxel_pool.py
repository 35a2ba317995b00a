"""BEV splat: scatter frustum features into the voxel grid.

TPU-native replacement for the reference's data-dependent pipeline of
OOB-filter -> rank-sort -> QuickCumsum segment-sum -> scatter
(reference: lss.py:238-280, terrain_encoder/utils.py:144-181).

The reference path creates dynamic shapes (boolean filtering) and needs a
hand-written autograd Function for the sorted segment-sum.  Here the splat is
ONE fixed-shape masked ``segment_sum``: every frustum point gets a flat voxel
id; out-of-bounds points keep their feature rows but are routed to a trash
segment with zero weight.  Mathematically identical (addition is commutative
— no sort needed), fully differentiable, and XLA lowers it to a scatter-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["voxel_pool"]


def voxel_pool(geom, feats, dx, bx, nx):
    """Pool frustum features into the BEV grid.

    Args:
      geom: (B, N, D, fH, fW, 3) ego-frame sample locations.
      feats: (B, N, D, fH, fW, C) lifted features.
      dx, bx, nx: grid cell sizes / first-cell centers / counts (3,), from
        ``gen_dx_bx``.

    Returns (B, X, Y, C * Z) BEV features (Z=nx[2], 1 for the default grid),
    X/Y indexed like the reference's ``final[b, :, z, x, y]`` layout.
    """
    B, N, D, fH, fW, C = feats.shape
    nx0, nx1, nx2 = int(nx[0]), int(nx[1]), int(nx[2])

    # voxel indices; trunc-toward-zero cast matches the reference `.long()`
    vox = ((geom - (bx - dx / 2.0)) / dx).astype(jnp.int32)
    ix, iy, iz = vox[..., 0], vox[..., 1], vox[..., 2]

    kept = ((ix >= 0) & (ix < nx0) & (iy >= 0) & (iy < nx1)
            & (iz >= 0) & (iz < nx2))

    n_cells = nx0 * nx1 * nx2
    batch_ix = jnp.arange(B, dtype=jnp.int32).reshape(B, 1, 1, 1, 1)
    flat_ids = (((batch_ix * nx0 + jnp.clip(ix, 0, nx0 - 1)) * nx1
                 + jnp.clip(iy, 0, nx1 - 1)) * nx2
                + jnp.clip(iz, 0, nx2 - 1))
    # route dropped points to the trash segment
    flat_ids = jnp.where(kept, flat_ids, B * n_cells)

    feats_flat = feats.reshape(-1, C)
    ids_flat = flat_ids.reshape(-1)
    pooled = jax.ops.segment_sum(feats_flat, ids_flat,
                                 num_segments=B * n_cells + 1)
    pooled = pooled[:-1].reshape(B, nx0, nx1, nx2, C)
    # collapse Z into channels: (B, X, Y, C * Z)
    return pooled.transpose(0, 1, 2, 4, 3).reshape(B, nx0, nx1, C * nx2)
