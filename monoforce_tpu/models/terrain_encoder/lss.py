"""Lift-Splat-Shoot terrain encoder (flax / NHWC / fixed shapes).

TPU-native re-design of the reference LiftSplatShoot (reference:
monoforce/src/monoforce/models/terrain_encoder/lss.py:167-302):

- lift: per-camera EfficientNet-B0 features, 1x1 depth-net producing a
  softmax depth distribution (D bins) ⊗ context (C channels) outer product
  (lss.py:49-99),
- splat: fixed-shape masked segment-sum instead of the reference's
  filter/sort/QuickCumsum (see monoforce_tpu.ops.voxel_pool),
- shoot: the physics engine consumes the predicted grids
  (monoforce_tpu.physics).

The public ``__call__`` keeps the reference's tensor convention
(imgs: (B, N_cams, 3, H, W); outputs: dict of (B, 1, X, Y)) so existing
tooling maps 1:1; internally everything is NHWC.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from monoforce_tpu.models.terrain_encoder.bev import BevEncode
from monoforce_tpu.models.terrain_encoder.efficientnet import EfficientNetB0
from monoforce_tpu.models.terrain_encoder.geometry import (
    create_frustum, gen_dx_bx, get_geometry,
)
from monoforce_tpu.models.terrain_encoder.layers import Up
from monoforce_tpu.ops.voxel_pool import voxel_pool

__all__ = ["LiftSplatShoot", "CamEncode", "half_inference_variables"]


def half_inference_variables(variables):
    """Serving-precision cast of an LSS variable tree: the CAMERA TRUNK
    (``camencode`` — EfficientNet-B0 + Up fusion + depth/context net, the
    256x416-resolution work) goes to bf16; the BEV encoder and the three
    terrain heads stay f32.

    Apply the result together with bf16 images
    (``imgs.astype(jnp.bfloat16)``): bf16 params x bf16 activations keep the
    whole trunk in bf16 (halved HBM traffic — the trunk is bandwidth-bound
    on TPU, where f32 convs already run as bf16 MXU passes), and the first
    f32 BEV conv promotes back to f32, so head outputs are f32.

    Measured on one v5e (4 cams, 256x416 -> 128x128 BEV, B=1, sustained):
    8.3 -> 4.1 ms (2.0x).  Casting the BEV stage too is NOT faster (4.3 ms)
    and is less accurate — the BEV grid is 128x128, a rounding error of
    compute next to the trunk.  Accuracy (perturbed-weights model with
    O(0.3 m) outputs): terrain/geom RMSE ~5 mm, friction RMSE ~0.02 —
    gated in tests/test_encoder.py::test_half_inference_variables.  Keep
    training and parity evaluation in f32; this is a serving mode (the
    reference serves f32 torch, monoforce_ros/nodes/terrain_encoder.py —
    the trade here is measured, documented, and opt-in).
    """
    def cast(t):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t)

    return {col: {k: (cast(v) if k == "camencode" else v)
                  for k, v in sub.items()}
            for col, sub in variables.items()}


class CamEncode(nn.Module):
    """Per-camera feature + depth-distribution encoder (lss.py:49-99).

    ``trunk_stages``/``up_ch`` default to the reference's EfficientNet-B0 +
    512-channel Up fusion; shorter stage tables build a reduced trunk
    through the same code path (the driver's multichip dryrun uses this —
    the sharding evidence doesn't need B0's compile cost on one CPU core).
    """

    D: int
    C: int
    trunk_stages: Any = None
    up_ch: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B*, H, W, 3) -> (B*, fH, fW, D, C) lifted features."""
        trunk = (EfficientNetB0() if self.trunk_stages is None
                 else EfficientNetB0(stages=tuple(self.trunk_stages)))
        endpoints = trunk(x, train)
        keys = sorted(endpoints, key=lambda k: int(k.rsplit("_", 1)[1]))
        h = Up(self.up_ch)(endpoints[keys[-1]], endpoints[keys[-2]], train)
        h = nn.Conv(self.D + self.C, (1, 1))(h)
        depth = nn.softmax(h[..., :self.D], axis=-1)        # (B*, fH, fW, D)
        ctx = h[..., self.D:self.D + self.C]                 # (B*, fH, fW, C)
        return depth[..., :, None] * ctx[..., None, :]       # outer product


class LiftSplatShoot(nn.Module):
    """grid_conf/data_aug_conf-driven LSS encoder with three terrain heads."""

    grid_conf: Any
    data_aug_conf: Any
    outC: int = 1
    camC: int = 64
    downsample: int = 16
    trunk_stages: Any = None    # reduced camera trunk (see CamEncode)
    cam_up_ch: int = 512

    def setup(self):
        dx, bx, nx = gen_dx_bx(self.grid_conf["xbound"],
                               self.grid_conf["ybound"],
                               self.grid_conf["zbound"])
        self.dx, self.bx, self.nx = jnp.asarray(dx), jnp.asarray(bx), nx
        self.frustum = create_frustum(self.data_aug_conf["final_dim"],
                                      self.grid_conf["dbound"],
                                      self.downsample)
        self.D = int(self.frustum.shape[0])
        self.camencode = CamEncode(self.D, self.camC,
                                   trunk_stages=self.trunk_stages,
                                   up_ch=self.cam_up_ch)
        self.bevencode = BevEncode(self.outC)

    def get_cam_feats(self, imgs, train: bool = False):
        """imgs: (B, N, 3, H, W) -> (B, N, D, fH, fW, C)."""
        B, N, C_in, H, W = imgs.shape
        x = imgs.reshape(B * N, C_in, H, W).transpose(0, 2, 3, 1)  # NHWC
        feats = self.camencode(x, train)                 # (B*N, fH, fW, D, C)
        fH, fW = feats.shape[1], feats.shape[2]
        feats = feats.transpose(0, 3, 1, 2, 4)           # (B*N, D, fH, fW, C)
        return feats.reshape(B, N, self.D, fH, fW, self.camC)

    def get_voxels(self, imgs, rots, trans, intrins, post_rots, post_trans,
                   train: bool = False):
        geom = get_geometry(self.frustum, rots, trans, intrins,
                            post_rots, post_trans)
        feats = self.get_cam_feats(imgs, train)
        return voxel_pool(geom, feats, self.dx, self.bx, self.nx)

    def __call__(self, imgs, rots, trans, intrins, post_rots, post_trans,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """Returns {'geom','terrain','diff','friction'}: (B, outC, X, Y)."""
        bev = self.get_voxels(imgs, rots, trans, intrins, post_rots,
                              post_trans, train)
        out = self.bevencode(bev, train)
        # NHWC -> reference NCHW convention
        return {k: v.transpose(0, 3, 1, 2) for k, v in out.items()}
