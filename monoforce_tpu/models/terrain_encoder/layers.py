"""Shared flax building blocks for the terrain encoder.

All convolutions run in NHWC (TPU-native layout).  ``upsample_align_corners``
reproduces torch's ``Upsample(mode='bilinear', align_corners=True)`` exactly
by building per-axis interpolation matrices and applying them as matmuls —
MXU-friendly and differentiable (jax.image.resize only offers half-pixel
sampling).
"""

from __future__ import annotations

import functools
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ScaledTanh", "Up", "ConvBNAct", "upsample_align_corners", "swish",
           "gelu_exact"]


def swish(x):
    return x * nn.sigmoid(x)


# torch nn.GELU defaults to the EXACT erf form (reference Up/head blocks,
# lss.py:39-41,118); jax/flax nn.gelu defaults to the tanh approximation —
# pin the exact form for parity.
gelu_exact = functools.partial(jax.nn.gelu, approximate=False)


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align-corners linear interpolation matrix."""
    if n_out == 1 or n_in == 1:
        return np.ones((n_out, n_in), dtype=np.float32) / n_in
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo).astype(np.float32)
    M = np.zeros((n_out, n_in), dtype=np.float32)
    M[np.arange(n_out), lo] += 1.0 - frac
    M[np.arange(n_out), hi] += frac
    return M


def upsample_align_corners(x, scale: int):
    """Bilinear align-corners upsample of (B, H, W, C) by an integer factor."""
    H, W = x.shape[1], x.shape[2]
    My = jnp.asarray(_interp_matrix(H, H * scale))
    Mx = jnp.asarray(_interp_matrix(W, W * scale))
    return jnp.einsum("ih,bhwc,jw->bijc", My, x, Mx)


class ScaledTanh(nn.Module):
    """min + (max - min) * (tanh(x) + 1) / 2 (reference: lss.py:17-24)."""

    min_val: float = -1.0
    max_val: float = 1.0

    @nn.compact
    def __call__(self, x):
        return self.min_val + (self.max_val - self.min_val) * (jnp.tanh(x) + 1) / 2


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    act: Callable = gelu_exact

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return self.act(x)


class Up(nn.Module):
    """Upsample + skip-concat + double conv (reference: lss.py:27-46)."""

    out_channels: int
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = upsample_align_corners(x1, self.scale_factor)
        x = jnp.concatenate([x2, x1], axis=-1)
        x = ConvBNAct(self.out_channels)(x, train)
        x = ConvBNAct(self.out_channels)(x, train)
        return x
