"""Pallas TPU kernel: bilinear terrain interpolation out of cached windows.

The fast rollout keeps a flattened 16x16 [z | friction] window per trajectory
(see physics/fast.py).  ``fk_interp`` is the fused lookup used by the
differentiable fast path (and the settle step of the planner path): it takes
world-frame query coordinates, computes cell indices and bilinear fractions
in-kernel, gathers the four taps for height and friction via Mosaic lane
gathers (``take_along_axis`` on 128-wide registers — the only fast
data-dependent lookup primitive; XLA's elementwise gather lowering is ~300x
slower for this pattern), and emits the five result planes
(z, n_x, n_y, n_z, mu).

The serving-grade planner goes further and fuses the whole per-point physics
step around these taps — see ops/fk_step_pallas.py.

Sources wider than one 128-lane register are handled by gathering each
128-segment and selecting by ``idx // 128`` (``_gather128``, shared with the
step kernels).

Backward pass: implemented by ``jax.vjp`` over the XLA reference
implementation (identical math); gradients flow through terrain windows for
inverse-physics uses — the planner never differentiates this path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fk_interp", "TAP_OFFSETS"]

TAP_OFFSETS = (0, 16, 1, 17)  # c, x+1 (front), y+1 (left), x+1&y+1
_RB = 512  # trajectories per program


def _gather128(patch, base, it, rb):
    """Gather patch[:, base + it] where the 256-wide source spans two
    128-lane registers; it: (rb, 128) in [0, 255] BY CONSTRUCTION (window
    indices are clipped to [0, 238] and tap offsets add at most 17), so the
    per-segment lane index is a one-op mask ``it & 127`` and segment choice
    a single compare — the former clip/floordiv/eq ladder cost ~6 extra VPU
    ops per segment (measured via scripts/kablate.py)."""
    lidx = it & 127
    v0 = jnp.take_along_axis(patch[:, base:base + 128], lidx, axis=1)
    v1 = jnp.take_along_axis(patch[:, base + 128:base + 256], lidx, axis=1)
    return jnp.where(it < 128, v0, v1)


def _fk_math(patch, wx, wy, sx, sy, d_max, res, gather):
    """Shared math for fk_interp: index computation + taps + quirky bilinear
    weights + forward-difference normals (reference dphysics.py:385-455 via
    the cached-window reformulation in physics/fast.py).

    Index coordinates DIVIDE by the resolution like the reference — a
    reciprocal multiply flips the int32 truncation on ~1.5e-6 of queries at
    cell boundaries (measured), which would break tap-exactness."""
    fxq = (wx + d_max) / res
    fyq = (wy + d_max) / res
    xi = fxq.astype(jnp.int32)     # trunc toward zero (reference .long())
    yi = fyq.astype(jnp.int32)
    xf = fxq - xi.astype(jnp.float32)
    yf = fyq - yi.astype(jnp.float32)
    xl = jnp.clip(xi - sx, 0, 14)
    yl = jnp.clip(yi - sy, 0, 14)
    idx = xl * 16 + yl
    tz = [gather(patch, 0, idx + off) for off in TAP_OFFSETS]
    tf = [gather(patch, 256, idx + off) for off in TAP_OFFSETS]
    w_cc = (1 - xf) * (1 - yf)
    w_cf = (1 - xf) * yf
    w_lc = xf * (1 - yf)
    w_fl = xf * yf
    # reference weight/tap pairing quirk (dphysics.py:442-445)
    z = w_cc * tz[0] + w_cf * tz[1] + w_lc * tz[2] + w_fl * tz[3]
    mu = w_cc * tf[0] + w_cf * tf[1] + w_lc * tf[2] + w_fl * tf[3]
    dz_dx = (tz[1] - tz[0]) / res
    dz_dy = (tz[2] - tz[0]) / res
    inv = lax.rsqrt(dz_dx * dz_dx + dz_dy * dz_dy + 1.0)
    return z, -dz_dx * inv, -dz_dy * inv, inv, mu


def _fk_kernel(cst_ref, patch_ref, wx_ref, wy_ref, sxy_ref, out_ref):
    d_max = cst_ref[0]
    res = cst_ref[1]
    patch = patch_ref[:]
    sx = sxy_ref[:, 0:1].astype(jnp.int32)    # (RB, 1), lane-broadcasts
    sy = sxy_ref[:, 1:2].astype(jnp.int32)
    rb, pw = wx_ref.shape
    for half in range(pw // 128):
        sl = slice(half * 128, (half + 1) * 128)
        planes = _fk_math(patch, wx_ref[:, sl], wy_ref[:, sl], sx, sy,
                          d_max, res,
                          lambda p, b, it: _gather128(p, b, it, rb))
        for j, plane in enumerate(planes):
            out_ref[:, j * pw + half * 128: j * pw + (half + 1) * 128] = plane


def _fk_xla(patch, wx, wy, sxy, cst):
    def gather(p, base, it):
        return jnp.take_along_axis(p[:, base:base + 256],
                                   jnp.clip(it, 0, 255), axis=1)
    planes = _fk_math(patch, wx, wy,
                      sxy[:, 0:1].astype(jnp.int32),
                      sxy[:, 1:2].astype(jnp.int32),
                      cst[0], cst[1], gather)
    return jnp.concatenate(planes, axis=1)


def _block_rows(B: int) -> int:
    """Largest row-block <= _RB dividing B on the (8, 128) tile grid — the
    kernel serves any batch (online node B=64 through bench B=4096) without
    the ~300x-slower XLA elementwise-gather fallback."""
    for rb in (512, 256, 128, 64, 32, 16, 8):
        if B % rb == 0:
            return rb
    return 0


def _fk_pallas(patch, wx, wy, sxy, cst, rb):
    B, pw = wx.shape
    return pl.pallas_call(
        _fk_kernel,
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, pw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 5 * pw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 5 * pw), jnp.float32),
    )(cst, patch, wx, wy, sxy)


@jax.custom_vjp
def fk_interp(patch, wx, wy, sxy, cst):
    """Fused terrain lookup for the fast rollout: world-frame query
    coordinates in, interpolated planes out (index math runs in-kernel so no
    per-step integer glue crosses the XLA/Pallas boundary).

    patch: (B, 512) [z(256) | friction(256)] row-major 16x16 windows;
    wx, wy: (B, PW) world-frame query coordinates, PW a multiple of 128;
    sxy: (B, 2) f32 window min-corners; cst: (2,) [d_max, grid_res].
    Returns (B, 5*PW): [z | n_x | n_y | n_z | mu] planes.
    """
    rb = _block_rows(patch.shape[0])
    if jax.default_backend() == "tpu" and rb:
        return _fk_pallas(patch, wx, wy, sxy, cst, rb)
    return _fk_xla(patch, wx, wy, sxy, cst)


def _fk_fwd(patch, wx, wy, sxy, cst):
    return fk_interp(patch, wx, wy, sxy, cst), (patch, wx, wy, sxy, cst)


def _fk_bwd(res, g):
    patch, wx, wy, sxy, cst = res
    _, vjp = jax.vjp(lambda p, a, b: _fk_xla(p, a, b, sxy, cst), patch, wx, wy)
    dp, dwx, dwy = vjp(g)
    return dp, dwx, dwy, None, None


fk_interp.defvjp(_fk_fwd, _fk_bwd)
