"""Native host-ops: build, parity with the numpy reference, and speed."""

import numpy as np
import pytest

from monoforce_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native hostops not built")


def test_heightmap_parity_with_numpy():
    from monoforce_tpu.datasets.rough import estimate_heightmap_np
    rng = np.random.default_rng(0)
    pts = rng.uniform(-8, 8, (20000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 3, 20000)
    pts[::97] = np.nan  # NaN rows must be ignored

    a = native.estimate_heightmap(pts, 0.1, 6.4, 2.0, r_min=0.6)
    # force the numpy path for the reference result
    import monoforce_tpu.native as nat
    lib, nat._LIB, nat._TRIED = nat._LIB, None, True
    try:
        b = estimate_heightmap_np(pts, 0.1, 6.4, 2.0, r_min=0.6)
    finally:
        nat._LIB, nat._TRIED = lib, True
    np.testing.assert_allclose(a[1], b[1])
    np.testing.assert_allclose(a[0], b[0], atol=1e-6)


def test_voxel_downsample_parity():
    from monoforce_tpu.robots import voxel_downsample as np_vds
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    a = native.voxel_downsample(pts, 0.1)
    b = np_vds(pts, 0.1)
    assert a.shape == b.shape
    # same centroids as sets (ordering differs: first-seen vs key-sorted)
    a_sorted = a[np.lexsort(a.T)]
    b_sorted = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a_sorted, b_sorted, atol=1e-5)


def test_filter_grid_one_point_per_cell():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-2, 2, (3000, 3)).astype(np.float32)
    idx = native.filter_grid(pts, 0.2)
    sel = pts[idx]
    keys = np.floor(sel / 0.2).astype(np.int64)
    assert len(np.unique(keys, axis=0)) == len(sel)
    # matches the numpy implementation's cell set
    from monoforce_tpu.ops.heightmap import filter_grid as np_fg
    ref = np_fg(pts, 0.2)
    assert len(ref) == len(sel)


def test_native_speedup_on_large_cloud():
    import time
    from monoforce_tpu.datasets.rough import estimate_heightmap_np
    rng = np.random.default_rng(3)
    pts = rng.uniform(-7, 7, (2_000_000, 3)).astype(np.float32)
    t0 = time.perf_counter()
    native.estimate_heightmap(pts, 0.1, 6.4, 2.0)
    t_native = time.perf_counter() - t0
    import monoforce_tpu.native as nat
    lib, nat._LIB, nat._TRIED = nat._LIB, None, True
    try:
        t0 = time.perf_counter()
        estimate_heightmap_np(pts, 0.1, 6.4, 2.0)
        t_numpy = time.perf_counter() - t0
    finally:
        nat._LIB, nat._TRIED = lib, True
    assert t_native < t_numpy, (t_native, t_numpy)
