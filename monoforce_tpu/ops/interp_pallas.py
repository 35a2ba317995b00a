"""Pallas TPU kernel for bilinear tap gathering out of cached terrain windows.

The fast rollout keeps a flattened 16x16 [z | friction] window per trajectory
(see physics/fast.py).  Each step needs eight gathered values per contact
point: four bilinear taps (c, x+1, y+1, x+1&y+1) from both the height and
friction planes.  XLA lowers this to elementwise gathers or padded one-hot
contractions (~1.3 ms/step at B=4096 on v5e); Mosaic's lane gather
(``take_along_axis`` on a 128-wide register) does it at vector rate.

The kernel processes RB=512 trajectories per program; sources wider than one
128-lane register are handled by gathering each 128-segment and selecting by
``idx // 128``.  Output layout: (B, 2048) with slot = tap_index * 2 + grid
(grid 0 = z, 1 = friction), 256 lanes per slot (two 128-point halves).

Backward pass: gathering is linear in the window values, so the custom VJP
scatters the cotangents back with a plain XLA scatter-add (gradients flow
through terrain windows for inverse-physics uses; the planner never
differentiates this path).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_taps", "TAP_OFFSETS"]

TAP_OFFSETS = (0, 16, 1, 17)  # c, x+1 (front), y+1 (left), x+1&y+1
_RB = 512  # trajectories per program


def _tap_kernel(patch_ref, idx_ref, out_ref):
    patch = patch_ref[:]          # (RB, 512) [z(256) | friction(256)]
    idx = idx_ref[:]              # (RB, PW) int32, values in [0, 238]
    n_halves = idx.shape[1] // 128
    pw = idx.shape[1]
    for half in range(n_halves):
        ih = idx[:, half * 128:(half + 1) * 128]
        for tap, off in enumerate(TAP_OFFSETS):
            it = ih + off
            for gi in range(2):
                base = gi * 256
                acc = jnp.zeros((_RB, 128), jnp.float32)
                for seg in range(2):
                    src = patch[:, base + seg * 128: base + (seg + 1) * 128]
                    lidx = jnp.clip(it - seg * 128, 0, 127)
                    v = jnp.take_along_axis(src, lidx, axis=1)
                    acc = jnp.where((it // 128) == seg, v, acc)
                slot = tap * 2 + gi
                out_ref[:, slot * pw + half * 128:
                        slot * pw + (half + 1) * 128] = acc


def _pallas_impl(patch, idx):
    B, pw = patch.shape[0], idx.shape[1]
    return pl.pallas_call(
        _tap_kernel,
        grid=(B // _RB,),
        in_specs=[
            pl.BlockSpec((_RB, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, pw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RB, 8 * pw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8 * pw), jnp.float32),
    )(patch, idx)


def _xla_impl(patch, idx):
    """Reference implementation (same output layout), used off-TPU."""
    outs = []
    for off in TAP_OFFSETS:
        for gi in range(2):
            outs.append(jnp.take_along_axis(
                patch[:, gi * 256:(gi + 1) * 256], idx + off, axis=1))
    return jnp.concatenate(outs, axis=1)


def _impl(patch, idx):
    if jax.default_backend() == "tpu" and patch.shape[0] % _RB == 0:
        return _pallas_impl(patch, idx)
    return _xla_impl(patch, idx)


@jax.custom_vjp
def gather_taps(patch, idx):
    """patch: (B, 512) f32 flattened [z | friction] windows (row-major 16x16);
    idx: (B, PW) int32 local flat indices (xl * 16 + yl, padded past P);
    PW is the point-lane width (a multiple of 128 — 128 for the default
    robot presets, whose contact sets fit one register).
    Returns (B, 8 * PW): eight (B, PW) tap planes, slot = tap * 2 + grid."""
    return _impl(patch, idx)


def _fwd(patch, idx):
    return _impl(patch, idx), (patch.shape, idx)


def _bwd(res, g):
    (B, _), idx = res
    pw = idx.shape[1]
    dpatch = jnp.zeros((B, 512), g.dtype)
    rows = jnp.arange(B)[:, None]
    for tap, off in enumerate(TAP_OFFSETS):
        for gi in range(2):
            slot = tap * 2 + gi
            dpatch = dpatch.at[rows, gi * 256 + idx + off].add(
                g[:, slot * pw:(slot + 1) * pw])
    return dpatch, None


gather_taps.defvjp(_fwd, _bwd)
