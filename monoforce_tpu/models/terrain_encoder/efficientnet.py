"""EfficientNet-B0 trunk in flax (NHWC), with multi-scale endpoints.

The reference uses ``efficientnet_pytorch`` and taps the feature maps just
before each spatial downsampling (reference: lss.py:73-94 get_eff_depth).
This is a from-scratch flax implementation of the same architecture
(MBConv with expansion, depthwise conv, squeeze-excitation, swish,
BN eps 1e-3), exposing ``reduction_4`` (112ch, /16) and ``reduction_5``
(320ch, /32) as the encoder taps.

Pretrained torch weights can be ported 1:1 (same graph); from-scratch
initialization is the default (no network access in this environment) —
stated per SURVEY.md §7 step 5.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn

from monoforce_tpu.models.terrain_encoder.layers import swish

__all__ = ["EfficientNetB0", "MBConv"]

# (expand_ratio, kernel, stride, out_channels, repeats) — the B0 stage table
B0_STAGES: Sequence[Tuple[int, int, int, int, int]] = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)

_BN = dict(epsilon=1e-3, momentum=0.99)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        mid = in_ch * self.expand
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=not train, **_BN)(h)
            h = swish(h)
        # depthwise
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    feature_group_count=mid, use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, **_BN)(h)
        h = swish(h)
        # squeeze-excitation
        se_ch = max(1, int(in_ch * self.se_ratio))
        se = h.mean(axis=(1, 2), keepdims=True)
        se = nn.Conv(se_ch, (1, 1))(se)
        se = swish(se)
        se = nn.Conv(mid, (1, 1))(se)
        h = nn.sigmoid(se) * h
        # project
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, **_BN)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            if self.drop_rate > 0:
                # stochastic depth (drop-connect): drop the whole residual
                # branch per sample, rescaled by 1/keep like the reference
                h = nn.Dropout(rate=self.drop_rate,
                               broadcast_dims=(1, 2, 3))(
                    h, deterministic=not train)
            h = h + x
        return h


class EfficientNetB0(nn.Module):
    """B0 trunk returning the /16 and /32 endpoints.

    ``stages`` defaults to the full B0 table; a shorter table builds a
    reduced trunk through the SAME code path (used by the driver's
    multichip dryrun, where compiling all 16 MBConv blocks on one CPU core
    blows the time budget — the sharding evidence doesn't need B0's depth).
    """

    drop_connect_rate: float = 0.2
    stages: Sequence[Tuple[int, int, int, int, int]] = B0_STAGES
    stem_ch: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem
        h = nn.Conv(self.stem_ch, (3, 3), strides=(2, 2), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, **_BN)(h)
        h = swish(h)

        endpoints = {}
        prev = h
        idx, total = 0, sum(s[-1] for s in self.stages)
        for (expand, k, stride, out_ch, repeats) in self.stages:
            for r in range(repeats):
                s = stride if r == 0 else 1
                h = MBConv(out_ch, k, s, expand,
                           drop_rate=self.drop_connect_rate * idx / total)(h, train)
                if prev.shape[1] > h.shape[1]:
                    endpoints[f"reduction_{len(endpoints) + 1}"] = prev
                prev = h
                idx += 1
        endpoints[f"reduction_{len(endpoints) + 1}"] = h
        return endpoints
