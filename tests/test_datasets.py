"""Dataset-layer tests on a synthetic ROUGH-layout sequence."""

import numpy as np
import pytest

from fixtures import make_sequence, tiny_lss_cfg
from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.datasets import ROUGH, estimate_heightmap_np
from monoforce_tpu.utils import compile_data, NumpyLoader


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return make_sequence(str(root), n_frames=4)


@pytest.fixture(scope="module")
def ds(seq):
    return ROUGH(seq, lss_cfg=tiny_lss_cfg(),
                 dphys_cfg=PhysicsConfig(robot="tradr", traj_sim_time=2.0))


def test_len_and_ids(ds):
    assert len(ds) == 4
    assert ds.stamp(0) == pytest.approx(100.0)
    assert ds.stamp(1) == pytest.approx(100.2)


def test_sample_tuple_shapes(ds):
    s = ds[0]
    (imgs, rots, trans, intrins, post_rots, post_trans,
     hm_geom, hm_terrain, control_ts, controls, pose0,
     traj_ts, Xs, Xds, Rs, Omegas) = s
    N = 4  # cameras
    assert imgs.shape == (N, 3, 32, 64)
    assert rots.shape == (N, 3, 3) and trans.shape == (N, 3)
    assert intrins.shape == (N, 3, 3)
    assert post_rots.shape == (N, 3, 3) and post_trans.shape == (N, 3)
    assert hm_geom.shape == (2, 128, 128)
    assert hm_terrain.shape == (2, 128, 128)
    n_ctrl = int(2.0 / 0.01)
    assert control_ts.shape == (n_ctrl,) and controls.shape == (n_ctrl, 2)
    assert pose0.shape == (4, 4)
    n_traj = int(np.ceil(2.0 / 0.1))
    assert traj_ts.shape == (n_traj,)
    assert Xs.shape == (n_traj, 3) and Rs.shape == (n_traj, 3, 3)
    assert Xds.shape == (n_traj, 3) and Omegas.shape == (n_traj, 3)


def test_controls_interpolated_constant(ds):
    _, controls = ds.get_controls(0)
    # the fixture commands constant (0.5, 0.1); zero-padded beyond recording
    mid = controls[: len(controls) // 2]
    np.testing.assert_allclose(mid[5], [0.5, 0.1], atol=1e-5)


def test_traj_moves_forward(ds):
    ts, (Xs, Xds, Rs, Om) = ds.get_states_traj(0)
    assert Xs[-1, 0] > Xs[0, 0] + 0.5  # drives ~0.5 m/s in +x
    assert abs(Xs[-1, 1]) < 0.1
    # finite-difference velocity matches the commanded speed
    np.testing.assert_allclose(Xds[:-1, 0], 0.5, atol=0.05)


def test_heightmaps_cached_and_masked(ds, seq):
    import os
    hm = ds.get_geom_height_map(0)
    assert os.path.exists(os.path.join(seq, "terrain", "geom"))
    mask = hm[1]
    assert 0.0 < mask.mean() < 1.0  # partial coverage
    # the bump at x~2 shows up in measured cells
    assert hm[0].max() > 0.2
    hm2 = ds.get_geom_height_map(0)  # cache hit
    np.testing.assert_allclose(hm, hm2)


def test_terrain_heightmap_contains_footprint(ds):
    hm = ds.get_terrain_height_map(0)
    assert hm.shape == (2, 128, 128)
    assert hm[1].sum() > 0  # footprint points always exist


def test_estimate_heightmap_np_matches_jax_op():
    import jax.numpy as jnp
    from monoforce_tpu.ops import estimate_heightmap
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7, 7, (500, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1, 1, 500)
    a = estimate_heightmap_np(pts, 0.1, 6.4, 2.0, r_min=0.6)
    b = np.asarray(estimate_heightmap(jnp.asarray(pts), 0.1, 6.4, 2.0, r_min=0.6))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_compile_data_and_loader(seq):
    def Data(path, is_train=False):
        return ROUGH(path, lss_cfg=tiny_lss_cfg(),
                     dphys_cfg=PhysicsConfig(robot="tradr", traj_sim_time=2.0),
                     is_train=is_train)

    train_ds, val_ds = compile_data([seq], Data, val_fraction=0.25)
    assert len(train_ds) == 3 and len(val_ds) == 1
    loader = NumpyLoader(train_ds, batch_size=2, shuffle=True)
    batch = next(iter(loader))
    assert batch[0].shape[0] == 2          # imgs (B, N, 3, h, w)
    assert batch[0].dtype == np.float32
    assert batch[10].shape == (2, 4, 4)    # pose0


def test_train_aug_is_stochastic(seq):
    ds_train = ROUGH(seq, lss_cfg=tiny_lss_cfg(),
                     dphys_cfg=PhysicsConfig(robot="tradr", traj_sim_time=2.0),
                     is_train=True)
    a = ds_train.get_images_data(0)[0]
    b = ds_train.get_images_data(0)[0]
    assert not np.allclose(a, b)  # random resize/rot differ between draws


def test_img_transform_post_homography_bookkeeping():
    """(post_rot, post_tran) must map ORIGINAL pixel coords to AUGMENTED
    pixel coords — the contract get_geometry relies on to undo augmentation
    (terrain_encoder/utils.py:52-76)."""
    from PIL import Image
    from monoforce_tpu.datasets.augment import img_transform

    H, W = 60, 80
    img = Image.new("RGB", (W, H), (0, 0, 0))
    # mark a small block away from the center (survives resampling)
    src_uv = (40, 30)
    for du in (-1, 0, 1):
        for dv in (-1, 0, 1):
            img.putpixel((src_uv[0] + du, src_uv[1] + dv), (255, 0, 0))

    post_rot = np.eye(2, dtype=np.float32)
    post_tran = np.zeros(2, dtype=np.float32)
    resize = 1.5
    resize_dims = (int(W * resize), int(H * resize))
    crop = (10, 8, 10 + 64, 8 + 64)
    out, pr, pt = img_transform(img, post_rot, post_tran, resize,
                                resize_dims, crop, flip=True, rotate=7.0)

    # predicted augmented location of the marked pixel
    uv = pr @ np.asarray(src_uv, np.float32) + pt
    arr = np.asarray(out)
    reds = np.argwhere((arr[..., 0] > 90) & (arr[..., 1] < 80))
    assert len(reds) > 0, "marker lost by augmentation"
    # reds are (row=v, col=u); nearest red pixel should be within the
    # marker's smearing radius of the prediction
    d = np.sqrt(((reds[:, ::-1] - uv[None, :]) ** 2).sum(1)).min()
    assert d < 4.0, (uv, d)


def test_img_transform_no_aug_identity():
    from PIL import Image
    from monoforce_tpu.datasets.augment import img_transform

    H, W = 32, 48
    img = Image.new("RGB", (W, H))
    out, pr, pt = img_transform(img, np.eye(2, dtype=np.float32),
                                np.zeros(2, np.float32), 1.0, (W, H),
                                (0, 0, W, H), False, 0.0)
    np.testing.assert_allclose(pr, np.eye(2), atol=1e-6)
    np.testing.assert_allclose(pt, 0.0, atol=1e-5)


def test_depth_to_cloud_roundtrip():
    """Back-projected depth pixels land at the expected camera-frame points
    (reference: examples/rgbd_data.ipynb depth_to_pc)."""
    from monoforce_tpu.datasets.camera import depth_to_cloud

    H, W = 6, 8
    K = np.asarray([[100.0, 0, 4.0], [0, 100.0, 3.0], [0, 0, 1.0]])
    depth = np.full((H, W), 2000.0)  # 2 m everywhere
    cloud = depth_to_cloud(depth, K)
    assert cloud.shape == (H * W, 3)
    np.testing.assert_allclose(cloud[:, 2], 2.0)
    # the principal-point pixel maps to x == y == 0
    idx = 3 * W + 4
    np.testing.assert_allclose(cloud[idx, :2], [0.0, 0.0], atol=1e-6)
    # one pixel right of center: x = (u - cx) * z / fx = 1 * 2 / 100
    np.testing.assert_allclose(cloud[idx + 1, 0], 0.02, rtol=1e-5)
