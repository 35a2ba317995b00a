"""TPU-optimized rollout path (the production hot loop).

Same step semantics as :mod:`monoforce_tpu.physics.engine` (the
reference-parity implementation), restructured for the hardware:

- **structure-of-arrays everywhere**: per-contact-point quantities are (B, PW)
  component planes and the carried rigid-body state is eighteen (B,) scalar
  planes.  No (B, 3) or (B, 3, 3) tensors exist inside the scan — a last dim
  of 3 uses 3/128 VPU lanes and batched 3x3 matmuls lower catastrophically;
- **lane-exact padding**: contact points are padded ONCE to PW = 128*ceil(P/128)
  lanes (ghost points at the body origin, masked out of contact), so no
  per-step ``pad``/``reshape``/ragged-slice relayouts exist anywhere in the
  loop.  Profiling on v5e showed the former per-step padding glue cost more
  than the entire physics math;
- **amortized terrain windows**: each trajectory's 16x16 height/friction
  window is extracted with exact one-hot MXU contractions every ``REFRESH``
  steps.  The robot moves well under one cell per step, so the window stays
  valid (margin analysis below);
- **fused index+tap kernel**: the per-step terrain lookup is ONE Pallas call
  (:func:`monoforce_tpu.ops.interp_pallas.fk_interp`) that takes world-frame
  coordinates and computes cell indices, bilinear fractions, the four lane-
  gather taps for z and friction, the reference's quirky bilinear weights and
  forward-difference normals in-kernel — only the five result planes cross
  the boundary;
- **unrolled step blocks**: the inner REFRESH steps are Python-unrolled inside
  the outer block scan (no nested ``lax.scan`` machinery);
- **Rodrigues update in components**, expanded over the nine rotation
  entries; per-step cost statistics (for path costs) are reduced inside the
  scan, so (B, N, P, 3) force tensors never exist.

Flipper articulation (marv): supported by passing ``joint_angles`` (B, N, 4);
the four point groups are rotated about their y-axis joints per step and the
inertia tensor is recomputed and inverted (symmetric 3x3 adjugate) in
component planes, matching engine.update_joints / dphysics.py:326-358.

Two rollouts live here (docs/PERFORMANCE.md has the measurement story):

- :func:`fast_rollout` — the differentiable production path described above
  (terrain lookups through the `fk_interp` kernel, everything else XLA);
- :func:`planner_rollout` — the forward-only SERVING path: the whole
  per-point step runs in one Pallas kernel reducing to eight (B,) planes in
  VMEM (`ops/fk_step_pallas.py`), integration is vectorized over the packed
  carry, and bf16 [z|mu] packed tap words fetch height AND friction in four
  gathers.  P <= 64 contact presets pack TWO trajectories per 128-lane
  register row (pair mode); 64 < P <= 256 presets — including the reference's
  own 0.1 m voxel resolution — run one trajectory per row over up to two
  registers of per-point planes (packed single mode).  All trades are
  measured and gated.  This is the headline-benchmark path (<10 ms
  sustained for 4096 x 100 steps on one v5e chip at the serving preset).

Equivalence to the exact path: in-bounds queries produce identical taps and
identical arithmetic; behavior differs from the reference's flat-index clamp
(dphysics.py:432-435) only for queries outside the grid or a stale window
(the window has >= 2 cells of margin and is refreshed every REFRESH=8 steps;
at |v| <= 2.5 m/s the drift between refreshes is under 2 cells).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from monoforce_tpu.physics.engine import RigidState, RobotModel, _default_state0

__all__ = ["fast_rollout", "planner_rollout", "planner_kernel_mode",
           "StepStats"]

_HI = lax.Precision.HIGHEST
_PATCH = 16
_REFRESH = 8        # steps between window refreshes (exact/fast path)
_REFRESH_PRED = 32  # planner cadence WITH motion-predicted window corners:
                    # the extractors place each window over the UNION of the
                    # footprint now and at the velocity-predicted end of the
                    # block.  Coverage bound: the union corner takes the MIN
                    # of the two footprints into a fixed 16-cell window with
                    # a 1-cell rear margin, so leading-edge taps are in-window
                    # while footprint extent + |v|*t_block <= ~13 cells; past
                    # that (rotated diagonal + max speed at the 0.1 m preset)
                    # edge taps clamp gracefully late in a block — same
                    # failure mode as the old 16-step cadence, and all
                    # trajectory-RMSE gates hold (tests/test_fast.py, 9 gates
                    # incl. rough-terrain)


class StepStats(NamedTuple):
    spring_std: jax.Array  # (B, N) std over points of |F_spring|
    abs_roll: jax.Array    # (B, N)
    abs_pitch: jax.Array   # (B, N)


def _extract_windows(z_grid, friction, qx, qy, d_max, grid_res):
    """Window min-corners from current query positions + (B, 512) row-major
    flattened [z(256) | friction(256)] patches.

    Windows are cut out with exact one-hot contractions on the MXU instead
    of batched ``dynamic_slice`` — XLA lowers varying-start slice batches to
    an elementwise gather that costs ~5 ms per call at B=4096 on v5e, while
    the two einsums below are <0.1 ms.  One-hot row/column selection is
    bit-exact (a single 1.0 per row).
    """
    H, W = z_grid.shape[-2:]
    B = qx.shape[0]
    xi = ((qx + d_max) / grid_res).astype(jnp.int32)
    yi = ((qy + d_max) / grid_res).astype(jnp.int32)
    # center the occupied span inside the window so both sides get margin
    sx = jnp.clip(jnp.min(xi, axis=1) - 2, 0, H - _PATCH)
    sy = jnp.clip(jnp.min(yi, axis=1) - 2, 0, W - _PATCH)

    rows = sx[:, None] + jnp.arange(_PATCH)          # (B, 16) absolute rows
    cols = sy[:, None] + jnp.arange(_PATCH)
    oh_rows = jax.nn.one_hot(rows, H, dtype=z_grid.dtype)   # (B, 16, H)
    oh_cols = jax.nn.one_hot(cols, W, dtype=z_grid.dtype)   # (B, 16, W)

    # Precision.HIGH (3 bf16 passes) is still BIT-EXACT for one-hot
    # selection: the one-hot operand's bf16 split has a zero low part, so
    # a_hi*b_hi + a_hi*b_lo + a_lo*b_hi == 1.0*b exactly — and it runs the
    # MXU at twice the rate of HIGHEST (6 passes).
    _SEL = lax.Precision.HIGH
    gg = jnp.concatenate([z_grid, friction], axis=-1)       # (.., H, 2W)
    if gg.ndim == 2:
        rows_sel = jnp.einsum("bkh,hw->bkw", oh_rows, gg, precision=_SEL)
    else:
        rows_sel = jnp.einsum("bkh,bhw->bkw", oh_rows, gg, precision=_SEL)
    pz = jnp.einsum("bkw,bcw->bkc", rows_sel[..., :W], oh_cols, precision=_SEL)
    pf = jnp.einsum("bkw,bcw->bkc", rows_sel[..., W:], oh_cols, precision=_SEL)
    patch_flat = jnp.concatenate(
        [pz.reshape(B, _PATCH * _PATCH), pf.reshape(B, _PATCH * _PATCH)],
        axis=-1)
    sxy = jnp.stack([sx, sy], axis=1).astype(jnp.float32)    # (B, 2)
    return sxy, patch_flat


def _extract_windows_packed(z_grid, friction, qx, qy, d_max, grid_res, dqx=None, dqy=None):
    """Window extraction producing packed bf16 trajectory-pair words for
    the pair-packed planner kernel: (B/2, 512) f32 words =
    [[z_A|z_B](256) | [mu_A|mu_B](256)] per row — or, when ``friction`` is
    None (uniform mu=1, the planner default), the (B/2, 256) [z_A|z_B]
    plane alone for the friction-free fk_step_pair_zu kernel.

    The grids are pre-cast to bf16 so the DEFAULT-precision (single bf16
    pass) one-hot einsums still select values EXACTLY — the quantization to
    bf16 is the pair mode's documented accuracy trade, and at one MXU pass
    the extraction runs ~3x faster than the exact path's Precision.HIGH."""
    H, W = z_grid.shape[-2:]
    B = qx.shape[0]
    xi = ((qx + d_max) / grid_res).astype(jnp.int32)
    yi = ((qy + d_max) / grid_res).astype(jnp.int32)
    if dqx is None:
        sx = jnp.clip(jnp.min(xi, axis=1) - 2, 0, H - _PATCH)
        sy = jnp.clip(jnp.min(yi, axis=1) - 2, 0, W - _PATCH)
    else:
        # motion-predicted corner: cover the UNION of the footprint now and
        # at the predicted end-of-block position (body velocity x block
        # duration), so the refresh cadence can stretch to _REFRESH_PRED
        # steps without the trailing-edge taps drifting out of the window
        # (coverage bound: extent + |v|*t_block <= ~13 cells, see
        # _REFRESH_PRED)
        xi2 = ((qx + dqx + d_max) / grid_res).astype(jnp.int32)
        yi2 = ((qy + dqy + d_max) / grid_res).astype(jnp.int32)
        sx = jnp.clip(jnp.minimum(jnp.min(xi, axis=1), jnp.min(xi2, axis=1))
                      - 1, 0, H - _PATCH)
        sy = jnp.clip(jnp.minimum(jnp.min(yi, axis=1), jnp.min(yi2, axis=1))
                      - 1, 0, W - _PATCH)

    rows = sx[:, None] + jnp.arange(_PATCH)
    cols = sy[:, None] + jnp.arange(_PATCH)
    oh_cols = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)

    if friction is None:
        gg = z_grid.astype(jnp.bfloat16)
    else:
        gg = jnp.concatenate([z_grid, friction], axis=-1).astype(jnp.bfloat16)
    oh_rows = jax.nn.one_hot(rows, H, dtype=jnp.bfloat16)
    # stage 1 stays bf16 end-to-end (selection of bf16 values is exact and
    # the (B, 16, 2W) intermediate is the bandwidth cost here); the final
    # stage accumulates to f32 so the packed words have zero low bits
    kw = dict(preferred_element_type=jnp.float32)
    if gg.ndim == 2:
        rows_sel = jnp.einsum("bkh,hw->bkw", oh_rows, gg)
    else:
        rows_sel = jnp.einsum("bkh,bhw->bkw", oh_rows, gg)
    pz = jnp.einsum("bkw,bcw->bkc", rows_sel[..., :W], oh_cols, **kw)
    # pz/pf hold exactly-bf16 values as f32, so their low 16 bits are zero:
    # pack per-cell TRAJECTORY-PAIR words with pure u32 bit ops (no
    # 16-bit-tile relayouts): word = [value_traj2i | value_traj2i+1], so the
    # kernel's taps cost one 256-wide gather per quantity
    def pair_words(v):
        u = lax.bitcast_convert_type(v.reshape(-1, 2, 256), jnp.uint32)
        return lax.bitcast_convert_type(
            (u[:, 0] & jnp.uint32(0xFFFF0000)) | (u[:, 1] >> 16), jnp.float32)

    sxy = jnp.stack([sx, sy], axis=1).astype(jnp.float32)
    if friction is None:
        return sxy, pair_words(pz)
    pf = jnp.einsum("bkw,bcw->bkc", rows_sel[..., W:], oh_cols, **kw)
    patch2 = jnp.concatenate([pair_words(pz), pair_words(pf)], axis=1)
    return sxy, patch2


def _extract_windows_packed1(z_grid, friction, qx, qy, d_max, grid_res, dqx=None, dqy=None):
    """Window extraction producing bf16 [z | mu] packed words for ONE
    trajectory per row: (B, 256) f32 words (vs the exact layout's (B, 512)
    f32) — half the extraction bytes, and the step kernel's four bilinear
    taps then fetch BOTH quantities per gather (fk_step_packed).  Same bf16
    selection trick as the pair extractor: grids pre-cast to bf16 make the
    DEFAULT-precision one-hot einsums exact."""
    H, W = z_grid.shape[-2:]
    B = qx.shape[0]
    xi = ((qx + d_max) / grid_res).astype(jnp.int32)
    yi = ((qy + d_max) / grid_res).astype(jnp.int32)
    if dqx is None:
        sx = jnp.clip(jnp.min(xi, axis=1) - 2, 0, H - _PATCH)
        sy = jnp.clip(jnp.min(yi, axis=1) - 2, 0, W - _PATCH)
    else:
        # motion-predicted corner: cover the UNION of the footprint now and
        # at the predicted end-of-block position (body velocity x block
        # duration), so the refresh cadence can stretch to _REFRESH_PRED
        # steps without the trailing-edge taps drifting out of the window
        # (coverage bound: extent + |v|*t_block <= ~13 cells, see
        # _REFRESH_PRED)
        xi2 = ((qx + dqx + d_max) / grid_res).astype(jnp.int32)
        yi2 = ((qy + dqy + d_max) / grid_res).astype(jnp.int32)
        sx = jnp.clip(jnp.minimum(jnp.min(xi, axis=1), jnp.min(xi2, axis=1))
                      - 1, 0, H - _PATCH)
        sy = jnp.clip(jnp.minimum(jnp.min(yi, axis=1), jnp.min(yi2, axis=1))
                      - 1, 0, W - _PATCH)

    rows = sx[:, None] + jnp.arange(_PATCH)
    cols = sy[:, None] + jnp.arange(_PATCH)
    oh_cols = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)
    gg = jnp.concatenate([z_grid, friction], axis=-1).astype(jnp.bfloat16)
    oh_rows = jax.nn.one_hot(rows, H, dtype=jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    if gg.ndim == 2:
        rows_sel = jnp.einsum("bkh,hw->bkw", oh_rows, gg)
    else:
        rows_sel = jnp.einsum("bkh,bhw->bkw", oh_rows, gg)
    pz = jnp.einsum("bkw,bcw->bkc", rows_sel[..., :W], oh_cols, **kw)
    pf = jnp.einsum("bkw,bcw->bkc", rows_sel[..., W:], oh_cols, **kw)
    # exactly-bf16 values as f32 -> pack [z_hi | mu_lo] per cell in u32 ops
    uz = lax.bitcast_convert_type(pz.reshape(B, 256), jnp.uint32)
    uf = lax.bitcast_convert_type(pf.reshape(B, 256), jnp.uint32)
    words = lax.bitcast_convert_type(
        (uz & jnp.uint32(0xFFFF0000)) | (uf >> 16), jnp.float32)
    sxy = jnp.stack([sx, sy], axis=1).astype(jnp.float32)
    return sxy, words


def _extract_windows_zpair(z_grid, qx, qy, d_max, grid_res,
                           dqx=None, dqy=None):
    """Window extraction for the UNIFORM-friction serving path: (B, 256)
    f32 words holding bf16 [z(i,j) | z(i,j+1)] per cell (j+1 clamped at the
    window edge), so the step kernel fetches all four bilinear taps with
    TWO lane gathers (fk_step_pair3_zu).  No friction plane is extracted at
    all — half the one-hot einsum width of the [z|mu] extractor."""
    H, W = z_grid.shape[-2:]
    B = qx.shape[0]
    xi = ((qx + d_max) / grid_res).astype(jnp.int32)
    yi = ((qy + d_max) / grid_res).astype(jnp.int32)
    if dqx is None:
        sx = jnp.clip(jnp.min(xi, axis=1) - 2, 0, H - _PATCH)
        sy = jnp.clip(jnp.min(yi, axis=1) - 2, 0, W - _PATCH)
    else:
        # motion-predicted corner: cover the UNION of the footprint now and
        # at the predicted end-of-block position (body velocity x block
        # duration), so the refresh cadence can stretch to _REFRESH_PRED
        # steps without the trailing-edge taps drifting out of the window
        # (coverage bound: extent + |v|*t_block <= ~13 cells, see
        # _REFRESH_PRED)
        xi2 = ((qx + dqx + d_max) / grid_res).astype(jnp.int32)
        yi2 = ((qy + dqy + d_max) / grid_res).astype(jnp.int32)
        sx = jnp.clip(jnp.minimum(jnp.min(xi, axis=1), jnp.min(xi2, axis=1))
                      - 1, 0, H - _PATCH)
        sy = jnp.clip(jnp.minimum(jnp.min(yi, axis=1), jnp.min(yi2, axis=1))
                      - 1, 0, W - _PATCH)

    rows = sx[:, None] + jnp.arange(_PATCH)
    cols = sy[:, None] + jnp.arange(_PATCH)
    oh_cols = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)
    gz = z_grid.astype(jnp.bfloat16)
    oh_rows = jax.nn.one_hot(rows, H, dtype=jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    if gz.ndim == 2:
        rows_sel = jnp.einsum("bkh,hw->bkw", oh_rows, gz)
    else:
        rows_sel = jnp.einsum("bkh,bhw->bkw", oh_rows, gz)
    pz = jnp.einsum("bkw,bcw->bkc", rows_sel, oh_cols, **kw)   # (B, 16, 16)
    # exactly-bf16 values as f32 -> pack [z(i,j) | z(i,j+1)] in u32 ops
    pzn = jnp.concatenate([pz[:, :, 1:], pz[:, :, 15:16]], axis=2)
    uz = lax.bitcast_convert_type(pz.reshape(B, 256), jnp.uint32)
    un = lax.bitcast_convert_type(pzn.reshape(B, 256), jnp.uint32)
    words = lax.bitcast_convert_type(
        (uz & jnp.uint32(0xFFFF0000)) | (un >> 16), jnp.float32)
    sxy = jnp.stack([sx, sy], axis=1).astype(jnp.float32)
    return sxy, words


def quantize_mu_grid(friction):
    """u8-quantize a friction grid for the muq serving path: scale 1/64
    (range [0, 3.98], step <=1/128 absolute — comparable to the bf16 z-tap
    trade and finer than pair mode's nearest-cell mu), returned as EXACT
    f32 integers 0..255 so the bf16 one-hot window einsums still select the
    values exactly.  Loop-invariant: called once per rollout, not per
    window refresh (the per-refresh round/clip chain cost a measured
    ~0.25 ms/refresh at B=4096)."""
    return jnp.clip(jnp.round(friction * 64.0), 0.0, 255.0)


def _extract_windows_zmuq(z_grid, mu_q, qx, qy, d_max, grid_res,
                          dqx=None, dqy=None):
    """Window extraction for the NON-uniform-friction serving path at the
    gather information floor: (B, 512) = [zpair(256) | muquad(256)] per
    trajectory.  zpair words are the zu layout's bf16 [z(i,j) | z(i,j+1)]
    (two kernel gathers fetch all four bilinear z taps); each muquad word
    packs the four friction taps of its cell — mu at TAP_OFFSETS order
    [c, c+16, c+1, c+17] — as u8 lanes, so ONE kernel gather fetches all
    four.  ``mu_q`` is the PRE-quantized grid from :func:`quantize_mu_grid`
    (exact f32 integers 0..255).  Consumed by fk_step_pair3_muq after the
    (B, 512) -> (B/2, 1024) pair reshape."""
    H, W = z_grid.shape[-2:]
    B = qx.shape[0]
    xi = ((qx + d_max) / grid_res).astype(jnp.int32)
    yi = ((qy + d_max) / grid_res).astype(jnp.int32)
    if dqx is None:
        sx = jnp.clip(jnp.min(xi, axis=1) - 2, 0, H - _PATCH)
        sy = jnp.clip(jnp.min(yi, axis=1) - 2, 0, W - _PATCH)
    else:
        # motion-predicted corner (see _REFRESH_PRED coverage bound)
        xi2 = ((qx + dqx + d_max) / grid_res).astype(jnp.int32)
        yi2 = ((qy + dqy + d_max) / grid_res).astype(jnp.int32)
        sx = jnp.clip(jnp.minimum(jnp.min(xi, axis=1), jnp.min(xi2, axis=1))
                      - 1, 0, H - _PATCH)
        sy = jnp.clip(jnp.minimum(jnp.min(yi, axis=1), jnp.min(yi2, axis=1))
                      - 1, 0, W - _PATCH)

    rows = sx[:, None] + jnp.arange(_PATCH)
    cols = sy[:, None] + jnp.arange(_PATCH)
    oh_cols = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)
    # STACK the z and mu planes on a leading axis (NOT concatenated along w):
    # both einsum outputs slice contiguously on that axis, where the
    # concatenated layout's rows_sel[..., W:] strided slice forced a 33 MB
    # copy per refresh — measured 639 -> 274 us/refresh (bit-exact)
    g2 = jnp.stack([z_grid, mu_q], axis=0).astype(jnp.bfloat16)
    oh_rows = jax.nn.one_hot(rows, H, dtype=jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    if z_grid.ndim == 2:
        rows_sel = jnp.einsum("bkh,shw->sbkw", oh_rows, g2)
    else:
        rows_sel = jnp.einsum("bkh,sbhw->sbkw", oh_rows, g2)
    p2 = jnp.einsum("sbkw,bcw->sbkc", rows_sel, oh_cols, **kw)
    pz, pf = p2[0], p2[1]

    # zpair plane: bf16 [z(i,j) | z(i,j+1)] packed in u32 ops (see
    # _extract_windows_zpair)
    pzn = jnp.concatenate([pz[:, :, 1:], pz[:, :, 15:16]], axis=2)
    uz = lax.bitcast_convert_type(pz.reshape(B, 256), jnp.uint32)
    un = lax.bitcast_convert_type(pzn.reshape(B, 256), jnp.uint32)
    zwords = lax.bitcast_convert_type(
        (uz & jnp.uint32(0xFFFF0000)) | (un >> 16), jnp.float32)

    # muquad plane: the four taps of cell (i, j) in TAP_OFFSETS order
    # [ (i,j), (i+1,j), (i,j+1), (i+1,j+1) ] as u8 lanes.  pf holds the
    # pre-quantized EXACT integers 0..255, so two f32 mul-adds build each
    # u16 half exactly (<= 65535 < 2^24) and one shift|or fuses the word —
    # no per-window round/clip.  Kernel index math clips to i,j <= 14, so
    # the edge-replicated shift rows/cols are never addressed
    m0 = pf
    m1 = jnp.concatenate([pf[:, 1:, :], pf[:, 15:16, :]], axis=1)
    m2 = jnp.concatenate([pf[:, :, 1:], pf[:, :, 15:16]], axis=2)
    m3 = jnp.concatenate([m1[:, :, 1:], m1[:, :, 15:16]], axis=2)
    u_hi = (m0 * 256.0 + m1).reshape(B, 256).astype(jnp.int32)
    u_lo = (m2 * 256.0 + m3).reshape(B, 256).astype(jnp.int32)
    mwords = lax.bitcast_convert_type((u_hi << 16) | u_lo, jnp.float32)
    sxy = jnp.stack([sx, sy], axis=1).astype(jnp.float32)
    return sxy, jnp.concatenate([zwords, mwords], axis=1)


def _rodrigues_components(r, w0, w1, w2, dt, eps=1e-6):
    """R <- R expm([w]_x dt) expanded over the nine rotation entries.

    Matches engine.integrate_rotation exactly (same formula, component form).
    """
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = r
    theta = jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)
    inv_t = 1.0 / jnp.maximum(theta, eps)
    nx, ny, nz = w0 * inv_t, w1 * inv_t, w2 * inv_t
    s = jnp.sin(theta * dt)
    c1 = 1.0 - jnp.cos(theta * dt)
    m00 = 1.0 + c1 * (-(ny * ny + nz * nz))
    m01 = -nz * s + c1 * nx * ny
    m02 = ny * s + c1 * nx * nz
    m10 = nz * s + c1 * nx * ny
    m11 = 1.0 + c1 * (-(nx * nx + nz * nz))
    m12 = -nx * s + c1 * ny * nz
    m20 = -ny * s + c1 * nx * nz
    m21 = nx * s + c1 * ny * nz
    m22 = 1.0 + c1 * (-(nx * nx + ny * ny))
    return (
        r00 * m00 + r01 * m10 + r02 * m20,
        r00 * m01 + r01 * m11 + r02 * m21,
        r00 * m02 + r01 * m12 + r02 * m22,
        r10 * m00 + r11 * m10 + r12 * m20,
        r10 * m01 + r11 * m11 + r12 * m21,
        r10 * m02 + r11 * m12 + r12 * m22,
        r20 * m00 + r21 * m10 + r22 * m20,
        r20 * m01 + r21 * m11 + r22 * m21,
        r20 * m02 + r21 * m12 + r22 * m22,
    )


class _Consts(NamedTuple):
    """Per-call constants with contact points padded to PW lanes."""
    px: jax.Array      # (PW,) body-frame point components (ghosts at origin)
    py: jax.Array
    pz: jax.Array
    maskv: jax.Array   # (PW,) 1.0 for real points
    dmask: jax.Array   # (K, PW) driving-part masks
    n_real: jax.Array  # () float P
    cst: jax.Array     # (2,) [d_max, 1/grid_res]
    jx: jax.Array      # (4,) flipper joint x positions
    jz: jax.Array      # (4,) flipper joint z positions


def _make_consts(robot: RobotModel) -> _Consts:
    P = robot.points.shape[0]
    pw = 128 * ((P + 127) // 128)
    pad = pw - P
    return _Consts(
        px=jnp.pad(robot.points[:, 0], (0, pad)),
        py=jnp.pad(robot.points[:, 1], (0, pad)),
        pz=jnp.pad(robot.points[:, 2], (0, pad)),
        maskv=jnp.pad(jnp.ones((P,), jnp.float32), (0, pad)),
        dmask=jnp.pad(robot.driving_masks, ((0, 0), (0, pad))),
        n_real=jnp.float32(P),
        cst=jnp.stack([robot.d_max, robot.grid_res]).astype(jnp.float32),
        jx=robot.joint_positions[:, 0],
        jz=robot.joint_positions[:, 2],
    )


def _articulate(c: _Consts, ja_t):
    """Rotate the four flipper point groups about their y-axis joints
    (engine.update_joints / dphysics.py:326-358), in (B, PW) planes.

    ja_t: (B, 4).  Returns per-batch point planes (B, PW) x 3.
    """
    px = jnp.broadcast_to(c.px, (ja_t.shape[0], c.px.shape[0]))
    pz = jnp.broadcast_to(c.pz, px.shape)
    for i in range(4):
        a = ja_t[:, i:i + 1]                       # (B, 1)
        cos_a, sin_a = jnp.cos(a), jnp.sin(a)
        gx = px - c.jx[i]
        gz = pz - c.jz[i]
        rx = cos_a * gx + sin_a * gz + c.jx[i]
        rz = -sin_a * gx + cos_a * gz + c.jz[i]
        gm = c.dmask[i]
        px = gm * rx + (1.0 - gm) * px
        pz = gm * rz + (1.0 - gm) * pz
    return px, jnp.broadcast_to(c.py, px.shape), pz


def _inertia_inv_planes(c: _Consts, mass, px, py, pz):
    """Masked per-batch inertia tensor + symmetric 3x3 inverse in (B,) planes
    (engine.inertia_tensor; recomputed per step when articulated, matching
    dphysics.py:196-197)."""
    m_pt = mass / c.n_real
    mv = c.maskv
    xx = jnp.sum(px * px * mv, axis=1)
    yy = jnp.sum(py * py * mv, axis=1)
    zz = jnp.sum(pz * pz * mv, axis=1)
    xy = jnp.sum(px * py * mv, axis=1)
    xz = jnp.sum(px * pz * mv, axis=1)
    yz = jnp.sum(py * pz * mv, axis=1)
    a = m_pt * (yy + zz)   # ixx
    d = m_pt * (xx + zz)   # iyy
    f = m_pt * (xx + yy)   # izz
    b = -m_pt * xy
    cc = -m_pt * xz
    e = -m_pt * yz
    # symmetric inverse via adjugate
    ca = d * f - e * e
    cb = cc * e - b * f
    cf = b * e - cc * d
    det = a * ca + b * cb + cc * cf
    inv_det = 1.0 / det
    i00 = ca * inv_det
    i01 = cb * inv_det
    i02 = cf * inv_det
    i11 = (a * f - cc * cc) * inv_det
    i12 = (b * cc - a * e) * inv_det
    i22 = (a * d - b * b) * inv_det
    return i00, i01, i02, i11, i12, i22


def _world_xy(c: _Consts, st, px, py, pz):
    """World-frame x/y of the contact points (for window extraction)."""
    (x0, x1, _, _, _, _, r00, r01, r02, r10, r11, r12,
     *_rest) = st
    if px.ndim == 1:
        px, py, pz = px[None], py[None], pz[None]
    wx = r00[:, None] * px + r01[:, None] * py + r02[:, None] * pz + x0[:, None]
    wy = r10[:, None] * px + r11[:, None] * py + r12[:, None] * pz + x1[:, None]
    return wx, wy


def _step(robot: RobotModel, c: _Consts, windows, st, tv_t, ja_t, integ, dt,
          with_stats):
    """One physics step over component planes; returns (new_state, outputs)."""
    from monoforce_tpu.ops.interp_pallas import fk_interp

    (x0, x1, x2, v0, v1, v2,
     r00, r01, r02, r10, r11, r12, r20, r21, r22, w0, w1, w2) = st
    m, g = robot.mass, robot.gravity
    sxy, patch = windows

    if ja_t is not None:
        px, py, pz = _articulate(c, ja_t)
        ii = _inertia_inv_planes(c, m, px, py, pz)
    else:
        px, py, pz = c.px[None], c.py[None], c.pz[None]
        ii = None

    # rotated body points (= lever arms r) and world points
    rx = r00[:, None] * px + r01[:, None] * py + r02[:, None] * pz
    ry = r10[:, None] * px + r11[:, None] * py + r12[:, None] * pz
    rz = r20[:, None] * px + r21[:, None] * py + r22[:, None] * pz
    wx = rx + x0[:, None]
    wy = ry + x1[:, None]
    wz = rz + x2[:, None]

    # point velocities (Koenig): xd + omega x r
    vx = v0[:, None] + w1[:, None] * rz - w2[:, None] * ry
    vy = v1[:, None] + w2[:, None] * rx - w0[:, None] * rz
    vz = v2[:, None] + w0[:, None] * ry - w1[:, None] * rx

    pw = wx.shape[1]
    out = fk_interp(patch, wx, wy, sxy, c.cst)     # (B, 5*PW)
    z = out[:, 0:pw]
    nx = out[:, pw:2 * pw]
    ny = out[:, 2 * pw:3 * pw]
    nz = out[:, 3 * pw:4 * pw]
    mu = out[:, 4 * pw:5 * pw]

    # soft contact + spring-damper (dphysics.py:220-234); ghosts masked out
    dh = wz - z
    contact = jax.nn.sigmoid(-10.0 * dh) * c.maskv
    vn = vx * nx + vy * ny + vz * nz
    scale = -(robot.stiffness * dh + robot.damping * vn)
    n_cp = jnp.sum(contact, axis=1, keepdims=True)
    # the reference divides unguarded (dphysics.py:231-232) and NaNs when the
    # body is far enough above the terrain that sigmoid underflows to exactly
    # 0 for EVERY point (dh > ~8.9 m in f32) — reachable through garbage
    # early-training terrain predictions.  Substitute the denominator ONLY
    # at exactly zero (0/1 = 0: no contact, no force); nonzero sums divide
    # bit-exactly like the reference — an eps clamp would zero forces over
    # the reachable dh ~ 5-9 m band where the contact sum is tiny but real.
    cs = scale * contact / jnp.where(n_cp > 0, n_cp, 1.0)
    mg = m * g
    fsx = jnp.clip(cs * nx, -mg, mg)
    fsy = jnp.clip(cs * ny, -mg, mg)
    fsz = jnp.clip(cs * nz, -mg, mg)
    # tiny bias keeps sqrt(0) at masked ghost lanes from NaN-ing the VJP;
    # it is invisible at f32 precision for any nonzero force
    spring_mag = jnp.sqrt(fsx * fsx + fsy * fsy + fsz * fsz + 1e-30)

    # velocity-based friction (dphysics.py:236-252)
    tn = lax.rsqrt(jnp.maximum(r00 * r00 + r10 * r10 + r20 * r20, 1e-12))
    t0 = (r00 * tn)[:, None]
    t1 = (r10 * tn)[:, None]
    t2 = (r20 * tn)[:, None]
    cmd = jnp.matmul(tv_t, c.dmask, precision=_HI)  # (B, PW)
    sfx = mu * (cmd * t0 - vx)
    sfy = mu * (cmd * t1 - vy)
    sfz = mu * (cmd * t2 - vz)
    sn = sfx * nx + sfy * ny + sfz * nz
    ffx = jnp.clip(spring_mag * (sfx - sn * nx), -mg, mg)
    ffy = jnp.clip(spring_mag * (sfy - sn * ny), -mg, mg)
    ffz = jnp.clip(spring_mag * (sfz - sn * nz), -mg, mg)

    # torques + accelerations (dphysics.py:254-267)
    fx_ = fsx + ffx
    fy_ = fsy + ffy
    fz_ = fsz + ffz
    tq0 = jnp.sum(ry * fz_ - rz * fy_, axis=1)
    tq1 = jnp.sum(rz * fx_ - rx * fz_, axis=1)
    tq2 = jnp.sum(rx * fy_ - ry * fx_, axis=1)
    om = robot.omega_max
    if ii is None:
        si = robot.inertia_inv
        aw0 = jnp.clip(si[0, 0] * tq0 + si[0, 1] * tq1 + si[0, 2] * tq2, -om, om)
        aw1 = jnp.clip(si[1, 0] * tq0 + si[1, 1] * tq1 + si[1, 2] * tq2, -om, om)
        aw2 = jnp.clip(si[2, 0] * tq0 + si[2, 1] * tq1 + si[2, 2] * tq2, -om, om)
    else:
        i00, i01, i02, i11, i12, i22 = ii
        aw0 = jnp.clip(i00 * tq0 + i01 * tq1 + i02 * tq2, -om, om)
        aw1 = jnp.clip(i01 * tq0 + i11 * tq1 + i12 * tq2, -om, om)
        aw2 = jnp.clip(i02 * tq0 + i12 * tq1 + i22 * tq2, -om, om)
    gd = robot.gravity_direction
    ax = (m * g * gd[0] + jnp.sum(fx_, axis=1)) / m
    ay = (m * g * gd[1] + jnp.sum(fy_, axis=1)) / m
    az = (m * g * gd[2] + jnp.sum(fz_, axis=1)) / m

    # semi-implicit integration: velocity first, position with the new one
    v0n, v1n, v2n = integ(v0, ax), integ(v1, ay), integ(v2, az)
    x0n, x1n, x2n = integ(x0, v0n), integ(x1, v1n), integ(x2, v2n)
    w0n, w1n, w2n = integ(w0, aw0), integ(w1, aw1), integ(w2, aw2)
    r = _rodrigues_components(
        (r00, r01, r02, r10, r11, r12, r20, r21, r22), w0n, w1n, w2n, dt)
    new = (x0n, x1n, x2n, v0n, v1n, v2n) + r + (w0n, w1n, w2n)

    outs = new
    if with_stats:
        mean = jnp.sum(spring_mag, axis=1) / c.n_real
        var = jnp.sum((spring_mag - mean[:, None]) ** 2 * c.maskv,
                      axis=1) / c.n_real
        roll = jnp.arctan2(r[7], r[8])
        pitch = jnp.arctan2(-r[6], jnp.sqrt(r[7] ** 2 + r[8] ** 2))
        outs = outs + (jnp.sqrt(var + 1e-30), jnp.abs(roll), jnp.abs(pitch))
    return new, outs


def _unpack_state(state0: RigidState):
    x, xd, R, omega = state0
    return (x[:, 0], x[:, 1], x[:, 2], xd[:, 0], xd[:, 1], xd[:, 2],
            R[:, 0, 0], R[:, 0, 1], R[:, 0, 2],
            R[:, 1, 0], R[:, 1, 1], R[:, 1, 2],
            R[:, 2, 0], R[:, 2, 1], R[:, 2, 2],
            omega[:, 0], omega[:, 1], omega[:, 2])


@functools.partial(jax.jit, static_argnames=("with_stats",))
def fast_rollout(robot: RobotModel, z_grid, controls,
                 state0: Optional[RigidState] = None, friction=None,
                 track_vels=None, joint_angles=None, with_stats: bool = True):
    """Batched rollout on the fast path.

    Args:
      z_grid: (H, W) shared terrain or (B, H, W) per-trajectory terrain.
      controls: (B, N, 2) commanded (v, w).
      state0: optional initial state with (B, ...) leaves.
      friction: friction grid(s), same shape convention as z_grid; ones if
        None.
      track_vels: optional precomputed (B, N, K) track velocities (otherwise
        derived from controls).
      joint_angles: optional (B, N, 4) flipper angles (marv articulation).
      with_stats: also return per-step cost statistics.

    Returns (states: RigidState with (B, N, ...) leaves, StepStats | None).
    The trailing ``N mod REFRESH`` steps run in a remainder block so any N is
    supported.
    """
    controls = jnp.asarray(controls, jnp.float32)
    z_grid = jnp.asarray(z_grid, jnp.float32)
    if friction is None:
        friction = jnp.ones_like(z_grid)
    if state0 is None:
        state0 = _default_state0(controls)
    if track_vels is None:
        from monoforce_tpu.physics.controls import vw_to_track_vels
        track_vels = vw_to_track_vels(controls[..., 0], controls[..., 1],
                                      robot.robot_size, robot.n_tracks)
    articulated = robot.has_flippers and joint_angles is not None

    c = _make_consts(robot)
    st = _unpack_state(state0)
    dt = robot.dt
    rk4 = robot.integration_mode == "rk4"

    def integ(a, da):
        if not rk4:
            return a + da * dt
        # reference 'rk4' formula (dphysics.py:375-380), scalar-plane form
        k1 = dt * da
        k2 = dt * (da + k1 / 2)
        k3 = dt * (da + k2 / 2)
        k4 = dt * (da + k3)
        return a + (k1 + 2 * k2 + 2 * k3 + k4) / 6

    # settle to mean terrain height under the body (dphysics.py:566-571) —
    # the reference settles with the UNARTICULATED cloud even when flipper
    # angles are supplied (it reads self.robot_points before update_joints)
    from monoforce_tpu.ops.interp_pallas import fk_interp
    wx0, wy0 = _world_xy(c, st, c.px, c.py, c.pz)
    sxy0, patch0 = _extract_windows(z_grid, friction, wx0, wy0,
                                    robot.d_max, robot.grid_res)
    z0 = fk_interp(patch0, wx0, wy0, sxy0, c.cst)[:, :wx0.shape[1]]
    z0_mean = jnp.sum(z0 * c.maskv, axis=1) / c.n_real
    st = st[:2] + (z0_mean,) + st[3:]

    def run_block(st, tvs, jas):
        """Refresh windows once, then run the block's steps unrolled."""
        if articulated:
            pxb, pyb, pzb = _articulate(c, jas[0])
        else:
            pxb, pyb, pzb = c.px, c.py, c.pz
        wx, wy = _world_xy(c, st, pxb, pyb, pzb)
        windows = _extract_windows(z_grid, friction, wx, wy,
                                   robot.d_max, robot.grid_res)
        outs = []
        for k in range(tvs.shape[0]):
            st, out_k = _step(robot, c, windows, st, tvs[k],
                              jas[k] if articulated else None,
                              integ, dt, with_stats)
            outs.append(out_k)
        stacked = tuple(jnp.stack([o[j] for o in outs])
                        for j in range(len(outs[0])))
        return st, stacked

    tv_t = jnp.swapaxes(track_vels, 0, 1)  # (N, B, K)
    if articulated:
        ja_t = jnp.swapaxes(jnp.asarray(joint_angles, jnp.float32), 0, 1)
    else:
        ja_t = jnp.zeros((tv_t.shape[0], 1, 4), jnp.float32)  # placeholder
    n_total = tv_t.shape[0]
    n_blocks, rem = divmod(n_total, _REFRESH)

    outs_parts = []
    if n_blocks > 0:
        blocks_tv = tv_t[:n_blocks * _REFRESH].reshape(
            (n_blocks, _REFRESH) + tv_t.shape[1:])
        blocks_ja = ja_t[:n_blocks * _REFRESH].reshape(
            (n_blocks, _REFRESH) + ja_t.shape[1:])
        st, outs_main = lax.scan(
            lambda s, b: run_block(s, b[0], b[1]), st, (blocks_tv, blocks_ja))
        # (n_blocks, REFRESH, ...) -> (N_main, ...)
        outs_main = jax.tree.map(
            lambda a: a.reshape((-1,) + a.shape[2:]), outs_main)
        outs_parts.append(outs_main)
    if rem > 0:
        st, outs_rem = run_block(st, tv_t[n_blocks * _REFRESH:],
                                 ja_t[n_blocks * _REFRESH:])
        outs_parts.append(outs_rem)
    outs = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs_parts) \
        if len(outs_parts) > 1 else outs_parts[0]

    planes = outs[:18]  # tuple of 18 arrays (N, B)
    xs = jnp.stack(planes[:3], axis=-1).swapaxes(0, 1)           # (B, N, 3)
    xds = jnp.stack(planes[3:6], axis=-1).swapaxes(0, 1)
    Rs = jnp.stack(planes[6:15], axis=-1).reshape(
        planes[6].shape + (3, 3)).swapaxes(0, 1)                 # (B, N, 3, 3)
    omegas = jnp.stack(planes[15:18], axis=-1).swapaxes(0, 1)

    # equilibrium sink-in compensation (dphysics.py:586-589)
    delta_h = robot.mass * robot.gravity / (robot.stiffness + 1e-6)
    xs = xs + Rs[..., :, 2] * delta_h
    states = RigidState(xs, xds, Rs, omegas)

    stats = None
    if with_stats:
        s, r_, p = outs[18:21]
        stats = StepStats(jnp.swapaxes(s, 0, 1), jnp.swapaxes(r_, 0, 1),
                          jnp.swapaxes(p, 0, 1))
    return states, stats


def planner_kernel_mode(robot: RobotModel, batch_size: int,
                        uniform_friction: bool = True) -> str:
    """Which serving kernel :func:`planner_rollout` will engage.

    This IS the dispatch (planner_rollout routes through it), exposed so the
    suite can pin each named preset to its intended kernel — a silent
    fallback to a slower mode would otherwise pass every accuracy test while
    losing the measured latency (docs/PERFORMANCE.md).  Returns one of:

    - ``"pair_zu"`` / ``"pair"``   — P <= 64, B % 16 == 0 (e.g. the 0.15 m
      serving presets, P=62); ``_zu`` when friction is uniform
      (friction=None, the reference planner default, dphysics.py:561-563)
    - ``"pair3_zu"`` / ``"pair3_muq"`` — 64 < P <= 192, B % 16 == 0 (incl.
      the reference's 0.1 m contact resolution, P=148); ``_muq`` when a
      friction grid rides along (the fused monoforce node's flagship
      workload, monoforce_node.py:157-159): z-pair words + one u8
      friction-quad gather — three gathers/step, the information floor
    - ``"packed"``  — P <= 256 but the batch cannot pair (B % 16 != 0)
    - ``"fallback"`` — non-euler integration or P > 256 (fast_rollout)
    """
    P = robot.points.shape[0]
    if robot.integration_mode != "euler" or P > 256:
        return "fallback"
    zu = "_zu" if uniform_friction else ""
    if P <= 64 and batch_size % 16 == 0:
        return "pair" + zu
    if 64 < P <= 192 and batch_size % 16 == 0:
        return "pair3" + (zu or "_muq")
    return "packed"


@functools.partial(jax.jit, static_argnames=("with_stats",))
def planner_rollout(robot: RobotModel, z_grid, controls,
                    state0: Optional[RigidState] = None, friction=None,
                    track_vels=None, with_stats: bool = True):
    """Serving-grade rollout for the shooting planner (the headline hot
    loop).  Same step physics as :func:`fast_rollout`, but the per-point
    math of each step runs inside one Pallas kernel
    (:mod:`monoforce_tpu.ops.fk_step_pallas`) that reduces to eight
    (B,) planes in VMEM, and integration + the Rodrigues update run as
    VECTORIZED ops on the packed (B, 18) carry (rotation update in matrix
    form R' = R (I + sin K + (1-cos) (kk^T - I)) over (B, 27) lanes — no
    per-column unstacking anywhere).  Profiling drove this split: the
    decomposed path spends 3x the math cost on fusion-boundary HBM spills of
    (B, 128) planes; carrying (B,) planes costs ~10 ms/100 steps in
    sublane<->lane relayouts at the kernel interface; and in-kernel
    integration costs ~12 ms/100 steps in Mosaic narrow-column arithmetic.

    For contact presets with P <= 64 points (e.g. ``mesh_voxel_size=0.15``)
    the kernel switches to **pair mode**: two trajectories share each
    128-lane register row — halving the per-point element count, which is
    the measured VPU roofline — with bf16-packed [z|mu] trajectory-pair tap
    words, nearest-cell friction, and REFRESH=16 window refreshes.  The
    accuracy trades are measured and gated (sub-mm trajectory RMSE on
    planner-regime terrain, within-preset cost-ranking Spearman > 0.99;
    see docs/PERFORMANCE.md "pair mode").

    For 64 < P <= 192 contact presets — including the reference's own 0.1 m
    voxel resolution (138-202 points, dphys_config.py:8) — the kernel runs
    in **pair3 mode**: two trajectories per row across THREE 128-lane
    registers (192 lanes each).  With a friction grid riding along (the
    fused monoforce node's flagship workload, monoforce_node.py:157-159)
    the ``fk_step_pair3_muq`` kernel runs at the gather information floor:
    bf16 z-pair words (two gathers fetch all four bilinear z taps) plus ONE
    u8 friction-quad gather, applied with the exact reference bilinear
    weights — the mu trade is the u8 step (<=1/128 absolute), gated against
    the exact-bilinear ``fk_step_pair3`` oracle in
    tests/test_fast.py::test_muq_*.  Batches whose shape cannot pair
    (B % 16 != 0) or presets up to P <= 256 fall to **packed single mode**
    (``fk_step_packed``): one trajectory per row over up to two registers
    with bf16 [z|mu] packed tap words.  The shared accuracy trade vs the
    exact path in every mode is the bf16 z-tap quantization (gated in
    tests/test_fast.py::test_planner_packed_*).

    Restrictions (falls back to :func:`fast_rollout` otherwise): no flipper
    articulation, euler integration, <= 256 contact points.  Forward-parity
    with fast_rollout is exact in structure but not bit-identical (MXU
    reduction order and the matrix-form Rodrigues differ in f32 rounding);
    trajectory RMSE is the gate (tests/test_fast.py::test_planner_rollout*,
    test_planner_pair_mode*).
    """
    P = robot.points.shape[0]
    mode = planner_kernel_mode(robot, controls.shape[0],
                               uniform_friction=friction is None)
    if mode == "fallback":
        return fast_rollout.__wrapped__(robot, z_grid, controls,
                                        state0=state0, friction=friction,
                                        track_vels=track_vels,
                                        with_stats=with_stats)
    from monoforce_tpu.ops.fk_step_pallas import (
        fk_step_packed, fk_step_pair, fk_step_pair3_muq, fk_step_pair3_zu,
        fk_step_pair_zu,
        pack_consts, pack_points, pack_points_pair, pack_points_pair3,
    )

    controls = jnp.asarray(controls, jnp.float32)
    z_grid = jnp.asarray(z_grid, jnp.float32)
    # friction=None means EXACTLY uniform mu=1 (reference dphysics.py:561-563
    # default; the diff_physics node plans without a friction layer) — the
    # serving paths then run friction-free kernels: pair3 packs z-pair tap
    # words (two gathers per step instead of four, fk_step_pair3_zu) and
    # pair mode drops its nearest-cell mu gather + all friction multiplies
    # and extracts only the z pair-word plane (fk_step_pair_zu)
    uniform_mu = friction is None
    if friction is None:
        friction = jnp.ones_like(z_grid)
    if state0 is None:
        state0 = _default_state0(controls)
    if track_vels is None:
        from monoforce_tpu.physics.controls import vw_to_track_vels
        track_vels = vw_to_track_vels(controls[..., 0], controls[..., 1],
                                      robot.robot_size, robot.n_tracks)
    B = controls.shape[0]
    K = track_vels.shape[-1]

    c = _make_consts(robot)
    cst = pack_consts(robot)
    # pair mode: P <= 64 contact presets pack two trajectories per register
    # row and read bf16 [z|mu] packed tap words — halves the per-point VPU
    # element count, which is the measured roofline (docs/PERFORMANCE.md).
    # the pair kernel serves any even batch whose half lands on the (8, 128)
    # sublane tile grid (fk_step_pallas._block_rows) — from the online
    # node's B=64 through the 4096-trajectory bench
    pair = mode.startswith("pair") and not mode.startswith("pair3")
    # pair3: 64 < P <= 192 presets (incl. the reference's 0.1 m cloud,
    # P=148) pack two trajectories across THREE registers (192 lanes each)
    # — 25% less per-point math than packed single mode's 2x256 lanes;
    # friction (when non-uniform) rides one u8 quad gather (muq kernel)
    pair3 = mode.startswith("pair3")
    if pair:
        pts = pack_points_pair(robot)
    elif pair3:
        pts = pack_points_pair3(robot)
    else:
        pts = pack_points(robot)
    st = _unpack_state(state0)

    # settle (same as fast_rollout)
    from monoforce_tpu.ops.interp_pallas import fk_interp
    wx0, wy0 = _world_xy(c, st, c.px, c.py, c.pz)
    sxy0, patch0 = _extract_windows(z_grid, friction, wx0, wy0,
                                    robot.d_max, robot.grid_res)
    z0 = fk_interp(patch0, wx0, wy0, sxy0, c.cst)[:, :wx0.shape[1]]
    st = st[:2] + (jnp.sum(z0 * c.maskv, axis=1) / c.n_real,) + st[3:]
    state18 = jnp.stack(st, axis=1)                           # (B, 18)

    dt = robot.dt
    eye9 = jnp.eye(3, dtype=jnp.float32).reshape(9)
    # R'[9i'+3j+k-flat] index maps for the (B, 27) product expansion:
    # out (i, j) sums over k of R[3i+k] * M[3k+j]
    _ri = jnp.asarray([3 * i + k for i in range(3) for j in range(3)
                       for k in range(3)])
    _mi = jnp.asarray([3 * k + j for i in range(3) for j in range(3)
                       for k in range(3)])

    def integrate(state18, acc8):
        """Semi-implicit Euler + Rodrigues, vectorized on the packed carry
        (same math as engine._update_state / integrate_rotation)."""
        vn = state18[:, 3:6] + acc8[:, 0:3] * dt
        xn = state18[:, 0:3] + vn * dt
        wn = state18[:, 15:18] + acc8[:, 3:6] * dt
        theta = jnp.sqrt(jnp.sum(wn * wn, axis=1, keepdims=True))
        k = wn / jnp.maximum(theta, 1e-6)
        s = jnp.sin(theta * dt)
        c1 = 1.0 - jnp.cos(theta * dt)
        kk = (k[:, :, None] * k[:, None, :]).reshape(-1, 9)
        zc = jnp.zeros_like(theta)
        K_ = jnp.concatenate(
            [zc, -k[:, 2:3], k[:, 1:2],
             k[:, 2:3], zc, -k[:, 0:1],
             -k[:, 1:2], k[:, 0:1], zc], axis=1)
        M = eye9 + s * K_ + c1 * (kk - eye9)                  # (B, 9)
        R = state18[:, 6:15]
        Rn = (R[:, _ri] * M[:, _mi]).reshape(-1, 9, 3).sum(-1)
        return jnp.concatenate([xn, vn, Rn, wn], axis=1)

    def _world_xy18(state18):
        # world x/y from (B, 1) column slices — lane broadcasts, no relayout
        x0 = state18[:, 0:1]
        x1 = state18[:, 1:2]
        wx = (state18[:, 6:7] * c.px + state18[:, 7:8] * c.py
              + state18[:, 8:9] * c.pz + x0)
        wy = (state18[:, 9:10] * c.px + state18[:, 10:11] * c.py
              + state18[:, 11:12] * c.pz + x1)
        return wx, wy

    def _make_run_block(extract, step):
        """One block = refresh windows once, then ``refresh`` fused steps.
        The three serving modes share the carry/stats discipline — carry
        stays (B, 18) across steps ((B/2, ...) views only at the kernel
        boundary: carrying the pair layout THROUGH integration was tried
        and reverted, +0.7 ms/batch, docs/PERFORMANCE.md "negative
        results"), and stats are sliced AFTER stacking (relayout once)."""
        def run_block(state18, tvs):
            wx, wy = _world_xy18(state18)
            # velocity-predicted end-of-block displacement (world frame):
            # the extractors cover the union footprint so the stretched
            # _REFRESH_PRED cadence cannot walk the taps out of the window
            t_blk = tvs.shape[0] * dt
            windows = extract(wx, wy, state18[:, 3:4] * t_blk,
                              state18[:, 4:5] * t_blk)
            states_k, stats_k = [], []
            for k in range(tvs.shape[0]):
                acc8 = step(windows, state18, tvs[k])
                state18 = integrate(state18, acc8)
                states_k.append(state18)
                stats_k.append(acc8)
            return state18, (jnp.stack(states_k), jnp.stack(stats_k))
        return run_block

    def _extract_single(wx, wy, dqx, dqy):
        return _extract_windows_packed1(z_grid, friction, wx, wy,
                                        robot.d_max, robot.grid_res,
                                        dqx, dqy)

    def _step_single(windows, state18, tv_k):
        sxy, patch1 = windows
        return fk_step_packed(cst, patch1, state18, tv_k, sxy, pts)

    n_k = robot.n_tracks

    def _extract_pair(wx, wy, dqx, dqy):
        sxy, patch2 = _extract_windows_packed(
            z_grid, None if uniform_mu else friction, wx, wy,
            robot.d_max, robot.grid_res, dqx, dqy)
        return sxy.reshape(-1, 4), patch2    # per-refresh relayouts only

    def _step_pair(windows, state18, tv_k):
        sxy2, patch2 = windows
        step = fk_step_pair_zu if uniform_mu else fk_step_pair
        return step(cst, patch2, state18.reshape(-1, 36),
                    tv_k.reshape(-1, 16), sxy2, pts,
                    n_k=n_k).reshape(-1, 8)

    # muq path: quantize the friction grid ONCE per rollout (exact f32
    # integers 0..255 ride the bf16 window einsums; the per-refresh
    # round/clip chain this replaces cost a measured ~0.25 ms/refresh)
    mu_q3 = quantize_mu_grid(friction) if not uniform_mu else None

    def _extract_pair3(wx, wy, dqx, dqy):
        # each trajectory's packed window comes from the single-trajectory
        # extractor ([z(j)|z(j+1)] z-pair words when the friction is
        # uniform; [zpair | u8 muquad] when a grid rides along); the
        # per-trajectory -> pair reshape concatenates the pair's windows
        # into the kernel's [w_A | w_B] rows
        if uniform_mu:
            sxy, patch1 = _extract_windows_zpair(
                z_grid, wx, wy, robot.d_max, robot.grid_res, dqx, dqy)
        else:
            sxy, patch1 = _extract_windows_zmuq(
                z_grid, mu_q3, wx, wy, robot.d_max, robot.grid_res,
                dqx, dqy)
        return sxy.reshape(-1, 4), patch1.reshape(-1, 2 * patch1.shape[1])

    def _step_pair3(windows, state18, tv_k):
        sxy2, patch2 = windows
        step = fk_step_pair3_zu if uniform_mu else fk_step_pair3_muq
        return step(cst, patch2, state18.reshape(-1, 36),
                    tv_k.reshape(-1, 16), sxy2, pts,
                    n_k=n_k).reshape(-1, 8)

    # (N, B, 8) zero-padded track velocities (kernel uses the first 4 lanes)
    tv_t = jnp.swapaxes(track_vels, 0, 1)
    tv_t = jnp.concatenate(
        [tv_t, jnp.zeros(tv_t.shape[:2] + (8 - K,), jnp.float32)], axis=-1)
    n_total = tv_t.shape[0]
    # all serving modes refresh every _REFRESH_PRED (32) steps with
    # motion-predicted window corners: the window covers the union of the
    # footprint now and at the velocity-predicted end of the block (see the
    # coverage bound at _REFRESH_PRED); OOB taps clamp gracefully
    refresh = _REFRESH_PRED
    n_blocks, rem = divmod(n_total, refresh)

    carry = state18
    if pair:
        block_fn = _make_run_block(_extract_pair, _step_pair)
    elif pair3:
        block_fn = _make_run_block(_extract_pair3, _step_pair3)
    else:
        block_fn = _make_run_block(_extract_single, _step_single)

    parts = []
    if n_blocks > 0:
        blocks_tv = tv_t[:n_blocks * refresh].reshape(
            (n_blocks, refresh) + tv_t.shape[1:])
        carry, outs_main = lax.scan(
            lambda s, b: block_fn(s, b), carry, blocks_tv)
        outs_main = jax.tree.map(
            lambda a: a.reshape((-1,) + a.shape[2:]), outs_main)
        parts.append(outs_main)
    if rem > 0:
        carry, outs_rem = block_fn(carry, tv_t[n_blocks * refresh:])
        parts.append(outs_rem)
    seq, acc_seq = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts) \
        if len(parts) > 1 else parts[0]
    s_std = acc_seq[..., 6]                                   # (N, B)

    seq = jnp.swapaxes(seq, 0, 1)                             # (B, N, 18)
    xs = seq[..., 0:3]
    xds = seq[..., 3:6]
    Rs = seq[..., 6:15].reshape(seq.shape[:2] + (3, 3))
    omegas = seq[..., 15:18]
    delta_h = robot.mass * robot.gravity / (robot.stiffness + 1e-6)
    xs = xs + Rs[..., :, 2] * delta_h
    states = RigidState(xs, xds, Rs, omegas)

    stats = None
    if with_stats:
        roll = jnp.arctan2(Rs[..., 2, 1], Rs[..., 2, 2])
        pitch = jnp.arctan2(-Rs[..., 2, 0],
                            jnp.sqrt(Rs[..., 2, 1] ** 2 + Rs[..., 2, 2] ** 2))
        stats = StepStats(jnp.swapaxes(s_std, 0, 1),
                          jnp.abs(roll), jnp.abs(pitch))
    return states, stats
