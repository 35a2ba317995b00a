"""Unit tests for the heightmap interpolation op."""

import jax.numpy as jnp
import numpy as np
import pytest

from monoforce_tpu.physics.terrain import interpolate_grid, normalized


D_MAX, RES = 6.4, 0.1


def _grid(fn):
    ax = np.arange(-D_MAX, D_MAX, RES, dtype=np.float32)
    gx, gy = np.meshgrid(ax, ax, indexing="ij")
    return jnp.asarray(fn(gx, gy))



# whole module is part of the fast pre-commit smoke tier
pytestmark = pytest.mark.smoke

def test_constant_grid():
    g = _grid(lambda x, y: np.full_like(x, 1.7))
    xq = jnp.asarray(np.random.default_rng(0).uniform(-6, 6, 64).astype(np.float32))
    yq = jnp.asarray(np.random.default_rng(1).uniform(-6, 6, 64).astype(np.float32))
    z = interpolate_grid(g, xq, yq, D_MAX, RES)
    np.testing.assert_allclose(z, 1.7, rtol=1e-6)


def test_grid_values_at_cell_corners():
    g = _grid(lambda x, y: 0.3 * x - 0.2 * y)
    # exact cell corners -> exact grid values
    idx = np.array([3, 50, 100])
    coords = -D_MAX + idx * RES
    z = interpolate_grid(g, jnp.asarray(coords, jnp.float32),
                         jnp.asarray(coords, jnp.float32), D_MAX, RES)
    np.testing.assert_allclose(z, 0.3 * coords - 0.2 * coords, atol=1e-5)


def test_planar_grid_stays_within_cell_range():
    # Interpolated values are convex combinations of the 4 taps, so on a
    # monotone plane the result stays within the local value range.
    g = _grid(lambda x, y: 0.5 * x + 0.1 * y)
    rng = np.random.default_rng(3)
    xq = rng.uniform(-6, 6, 128).astype(np.float32)
    yq = rng.uniform(-6, 6, 128).astype(np.float32)
    z = np.asarray(interpolate_grid(g, jnp.asarray(xq), jnp.asarray(yq), D_MAX, RES))
    exact = 0.5 * xq + 0.1 * yq
    assert np.abs(z - exact).max() < 0.5 * RES + 0.1 * RES + 1e-4


def test_quirk_cross_term_swap():
    """y_frac must weight the +x tap (parity with dphysics.py:442-445)."""
    H = W = 4
    g = jnp.zeros((H, W), jnp.float32).at[2, 1].set(1.0)  # value at x-idx 2, y-idx 1
    d_max, res = 2.0, 1.0
    # query inside cell (1, 1): base taps (1,1)=(0), +x tap (2,1)=1
    xq = jnp.asarray([-0.75], jnp.float32)  # fx = 1.25 -> x_i=1, x_frac=.25
    yq = jnp.asarray([-0.50], jnp.float32)  # fy = 1.50 -> y_i=1, y_frac=.50
    z = interpolate_grid(g, xq, yq, d_max, res)
    # reference weight on +x tap = (1-x_frac)*y_frac = 0.75*0.5
    np.testing.assert_allclose(z, 0.375, atol=1e-6)


def test_out_of_bounds_clamped():
    g = _grid(lambda x, y: x + y)
    z = interpolate_grid(g, jnp.asarray([100.0]), jnp.asarray([100.0]), D_MAX, RES)
    assert np.isfinite(np.asarray(z)).all()


def test_normals_flat_and_slope():
    flat = _grid(lambda x, y: np.zeros_like(x))
    _, n = interpolate_grid(flat, jnp.asarray([0.0]), jnp.asarray([0.0]),
                            D_MAX, RES, return_normals=True)
    np.testing.assert_allclose(n, [[0.0, 0.0, 1.0]], atol=1e-6)

    slope = _grid(lambda x, y: 0.5 * x)
    _, n = interpolate_grid(slope, jnp.asarray([1.0]), jnp.asarray([1.0]),
                            D_MAX, RES, return_normals=True)
    expect = np.array([-0.5, 0.0, 1.0]) / np.linalg.norm([-0.5, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(n)[0], expect, atol=1e-4)


def test_matches_oracle():
    from oracle import interp
    rng = np.random.default_rng(42)
    g = rng.normal(size=(128, 128)).astype(np.float32)
    xq = rng.uniform(-7, 7, 256).astype(np.float32)
    yq = rng.uniform(-7, 7, 256).astype(np.float32)
    z_j, n_j = interpolate_grid(jnp.asarray(g), jnp.asarray(xq), jnp.asarray(yq),
                                D_MAX, RES, return_normals=True)
    z_o, n_o = interp(g, xq, yq, D_MAX, RES, normals=True)
    # f32 FMA/ordering differences between XLA and numpy are ~1e-5
    np.testing.assert_allclose(np.asarray(z_j), z_o, atol=2e-4)
    np.testing.assert_allclose(np.asarray(n_j), n_o, atol=2e-4)


def test_normalized_zero_safe():
    out = normalized(jnp.zeros((3,)))
    assert np.isfinite(np.asarray(out)).all()
