"""Bilinear heightmap interpolation with surface normals.

Replicates the lookup semantics of the reference ``DPhysics.interpolate_grid``
(reference: dphysics.py:385-455) exactly — including its quirks, which are part
of the parity spec (SURVEY.md "hard parts"):

- continuous index ``(q + d_max) / grid_res`` truncated toward zero (torch
  ``.long()`` semantics, not floor),
- flat index ``i = y + H * x`` (assumes square grids, H==W),
- all four tap indices clamped to ``[0, H*W - 1]``,
- normals from forward differences of the two x/y taps,
  ``n = normalize([-dz/dx, -dz/dy, 1])``.

The function operates on a single ``(H, W)`` grid with ``(...,)``-shaped query
vectors; batching is done with ``jax.vmap`` by the engine.  XLA lowers the
four taps to gathers out of a grid that comfortably fits in VMEM (128x128 f32
= 64 KiB), which profiling shows is already near HBM speed-of-light for the
rollout workload; a Pallas fused-rollout kernel is the planned next step.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["interpolate_grid", "normalized"]


def normalized(x, eps: float = 1e-6, axis: int = -1):
    """x / max(||x||, eps) along ``axis`` (reference: dphysics.py:7-19)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.clip(norm, min=eps)


def interpolate_grid(grid, x_query, y_query, d_max, grid_res,
                     return_normals: bool = False):
    """Bilinear interpolation of ``grid`` at metric coordinates.

    Args:
      grid: (H, W) height (or friction, ...) values; first axis is x.
      x_query, y_query: (...,) metric coordinates in [-d_max, d_max).
      d_max: half-extent of the grid in metres.
      grid_res: cell size in metres.
      return_normals: also return forward-difference surface normals.

    Returns:
      z: (...,) interpolated values, and optionally n: (..., 3) unit normals.
    """
    H, W = grid.shape
    flat = grid.reshape(-1)

    xi = (x_query + d_max) / grid_res
    yi = (y_query + d_max) / grid_res
    # Truncation toward zero matches the reference's `.long()` cast.
    x_i = xi.astype(jnp.int32)
    y_i = yi.astype(jnp.int32)
    x_frac = xi - x_i.astype(xi.dtype)
    y_frac = yi - y_i.astype(yi.dtype)

    last = H * W - 1
    i_c = jnp.clip(y_i + H * x_i, 0, last)
    i_f = jnp.clip(y_i + H * (x_i + 1), 0, last)
    i_l = jnp.clip((y_i + 1) + H * x_i, 0, last)
    i_fl = jnp.clip((y_i + 1) + H * (x_i + 1), 0, last)

    z_c = jnp.take(flat, i_c)
    z_f = jnp.take(flat, i_f)
    z_l = jnp.take(flat, i_l)
    z_fl = jnp.take(flat, i_fl)

    # NOTE the weight/tap pairing: the reference (dphysics.py:442-445) applies
    # y_frac to the +x tap and x_frac to the +y tap — transposed with respect
    # to textbook bilinear.  This compensates the heightmap `.T` convention in
    # the data layer (cloudproc.py:142-144) and is replicated verbatim.
    z = ((1 - x_frac) * (1 - y_frac) * z_c
         + (1 - x_frac) * y_frac * z_f
         + x_frac * (1 - y_frac) * z_l
         + x_frac * y_frac * z_fl)

    if not return_normals:
        return z

    dz_dx = (z_f - z_c) / grid_res
    dz_dy = (z_l - z_c) / grid_res
    n = jnp.stack([-dz_dx, -dz_dy, jnp.ones_like(dz_dx)], axis=-1)
    return z, normalized(n)
