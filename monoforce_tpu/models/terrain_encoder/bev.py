"""BEV encoder with three terrain heads.

Reference parity: BevEncode (lss.py:101-165) — ResNet-18 layers 1-3 over the
splatted BEV features, an Up fusion back to half resolution, and three
upsampling heads: geom (ScaledTanh(-1, 1)), diff (ReLU), friction (ReLU),
with ``terrain = geom - diff`` (lss.py:158).
"""

from __future__ import annotations

import flax.linen as nn

from monoforce_tpu.models.terrain_encoder.layers import (
    ScaledTanh, Up, gelu_exact, upsample_align_corners,
)

__all__ = ["BevEncode", "BasicBlock"]


class BasicBlock(nn.Module):
    """ResNet-18 basic block (two 3x3 convs + identity/projection skip)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        # torchvision pads SYMMETRICALLY (conv3x3: padding=1) even at
        # stride 2; flax 'SAME' would pad (0, 1) there — a one-pixel window
        # misalignment vs the reference resnet18 trunk (lss.py:105-112).
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False)(h)
        # zero-init the last BN scale like resnet18(zero_init_residual=True)
        h = nn.BatchNorm(use_running_average=not train,
                         scale_init=nn.initializers.zeros)(h)
        if self.stride != 1 or identity.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(identity)
            identity = nn.BatchNorm(use_running_average=not train)(identity)
        return nn.relu(h + identity)


class _Head(nn.Module):
    """Upsample x2 + 3x3 conv + BN + GELU + 1x1 conv + activation
    (reference: lss.py:115-138)."""

    out_ch: int
    final_act: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample_align_corners(x, 2)
        x = nn.Conv(128, (3, 3), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = gelu_exact(x)
        x = nn.Conv(self.out_ch, (1, 1))(x)
        return self.final_act(x)


class BevEncode(nn.Module):
    out_ch: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, X, Y, C) BEV features -> dict of (B, X, Y, out_ch) maps."""
        # symmetric padding=3 like the reference conv1 (lss.py:106) — flax
        # 'SAME' at stride 2 would pad (2, 3) and shift every window
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)

        x1 = BasicBlock(64)(h, train)
        x1 = BasicBlock(64)(x1, train)
        h = BasicBlock(128, stride=2)(x1, train)
        h = BasicBlock(128)(h, train)
        h = BasicBlock(256, stride=2)(h, train)
        h = BasicBlock(256)(h, train)

        h = Up(256, scale_factor=4)(h, x1, train)

        geom = _Head(self.out_ch, ScaledTanh(-1.0, 1.0))(h, train)
        diff = _Head(self.out_ch, nn.relu)(h, train)
        friction = _Head(self.out_ch, nn.relu)(h, train)
        return {
            "geom": geom,
            "terrain": geom - diff,
            "diff": diff,
            "friction": friction,
        }
