"""Config and robot-geometry tests."""

import os

import numpy as np
import pytest

from monoforce_tpu.config import PhysicsConfig, LSSConfig
from monoforce_tpu.robots import (
    voxel_downsample, robot_point_cloud, driving_part_masks, load_obj_vertices,
)



# whole module is part of the fast pre-commit smoke tier
pytestmark = pytest.mark.smoke

def test_presets_build():
    for robot in ("tradr", "marv", "husky"):
        cfg = PhysicsConfig(robot=robot)
        P = cfg.robot_points.shape[0]
        assert 80 <= P <= 600, f"{robot}: {P} contact points"
        K = cfg.driving_parts.shape[0]
        assert K == (2 if robot == "tradr" else 4)
        assert cfg.driving_parts.shape == (K, P)
        # driving parts are disjoint and non-empty
        assert cfg.driving_parts.sum(axis=0).max() <= 1
        assert cfg.driving_parts.any(axis=1).all()


def test_masses_and_damping():
    cfg = PhysicsConfig(robot="tradr")
    assert cfg.robot_mass == 40.0
    np.testing.assert_allclose(cfg.damping, np.sqrt(4 * 40.0 * 50_000.0))
    assert PhysicsConfig(robot="marv").robot_mass == 60.0
    assert PhysicsConfig(robot="husky").robot_mass == 50.0


def test_grid_shape_and_steps():
    cfg = PhysicsConfig(robot="tradr")
    assert cfg.grid_shape == (128, 128)
    assert cfg.n_sim_steps == 500
    cfg4 = PhysicsConfig(robot="tradr", grid_res=0.4)
    assert cfg4.grid_shape == (32, 32)


def test_yaml_roundtrip(tmp_path):
    cfg = PhysicsConfig(robot="marv", grid_res=0.4, traj_sim_time=3.0)
    p = tmp_path / "cfg.yaml"
    cfg.to_yaml(str(p))
    cfg2 = PhysicsConfig.from_yaml(str(p))
    assert cfg2.robot == "marv"
    assert cfg2.grid_res == 0.4
    assert cfg2.traj_sim_time == 3.0
    assert cfg2.robot_mass == cfg.robot_mass
    np.testing.assert_allclose(cfg2.robot_points, cfg.robot_points)


def test_yaml_roundtrip_restores_modified_derived_fields(tmp_path):
    """from_yaml restores EVERY serialized attribute exactly as saved, like
    the reference DPhysConfig.from_yaml (dphys_config.py:173-188) — even
    derived fields the constructor would recompute."""
    cfg = PhysicsConfig(robot="marv")
    cfg.robot_mass = 72.5                       # user-modified derived fields
    cfg.damping = 1234.0
    cfg.robot_size = (0.9, 0.7)
    cfg.joint_positions = {k: [0.1, 0.2, 0.3] for k in ("fl", "fr", "rl", "rr")}
    cfg.joint_angles = {"fl": 0.5, "fr": -0.5, "rl": 0.25, "rr": -0.25}
    cfg.gravity_direction = (0.0, 0.1, -0.99)
    p = tmp_path / "cfg.yaml"
    cfg.to_yaml(str(p))
    cfg2 = PhysicsConfig.from_yaml(str(p))
    assert cfg2.robot_mass == 72.5
    assert cfg2.damping == 1234.0
    assert tuple(cfg2.robot_size) == (0.9, 0.7)
    assert cfg2.joint_positions == cfg.joint_positions
    assert cfg2.joint_angles == cfg.joint_angles
    assert tuple(cfg2.gravity_direction) == (0.0, 0.1, -0.99)


def test_voxel_downsample_centroids():
    pts = np.array([[0.01, 0.01, 0.0], [0.09, 0.01, 0.0],   # same voxel
                    [0.51, 0.0, 0.0]], dtype=np.float32)    # another voxel
    out = voxel_downsample(pts, 0.1)
    assert out.shape == (2, 3)
    got = sorted(out[:, 0].tolist())
    np.testing.assert_allclose(got, [0.05, 0.51], atol=1e-6)


def test_obj_loader(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("# comment\nv 0 0 0\nv 1.5 0 0\nv 0 2.5 0\nf 1 2 3\n")
    v = load_obj_vertices(str(p))
    assert v.shape == (3, 3)
    np.testing.assert_allclose(v[1], [1.5, 0, 0])
    cloud = robot_point_cloud("tradr", mesh_path=str(p), voxel_size=0.0)
    assert cloud.shape == (3, 3)


def test_driving_masks_sides():
    cfg = PhysicsConfig(robot="tradr")
    pts = cfg.robot_points
    left, right = cfg.driving_parts
    assert (pts[left][:, 1] > 0).all()
    assert (pts[right][:, 1] < 0).all()


def test_lss_config_defaults_and_yaml(tmp_path):
    lss = LSSConfig()
    assert lss.grid_conf["dbound"] == (0.6, 6.4, 0.1)
    assert lss.data_aug_conf["final_dim"] == (256, 416)
    p = tmp_path / "lss.yaml"
    lss.to_yaml(str(p))
    lss2 = LSSConfig.from_yaml(str(p))
    assert tuple(lss2.grid_conf["xbound"]) == (-6.4, 6.4, 0.1)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/monoforce/config"),
    reason="reference configs not found")
def test_lss_config_loads_both_reference_yamls():
    """Both committed reference configs load as-is: the full
    ``lss_cfg.yaml`` and the PARTIAL ``lss_cfg_resize.yaml`` variant
    (H/W 300x480, no aug-limit or soft-class keys — reference
    config/lss_cfg_resize.yaml), whose val-mode augmentation must still
    sample (val mode touches only bot_pct_lim/final_dim)."""
    from monoforce_tpu.datasets.augment import sample_augmentation

    full = LSSConfig.from_yaml("/root/reference/monoforce/config/lss_cfg.yaml")
    assert full.data_aug_conf["H"] == 1200 and full.data_aug_conf["W"] == 1920
    assert tuple(full.data_aug_conf["final_dim"]) == (256, 416)

    rsz = LSSConfig.from_yaml(
        "/root/reference/monoforce/config/lss_cfg_resize.yaml")
    assert rsz.data_aug_conf["H"] == 300 and rsz.data_aug_conf["W"] == 480
    assert "resize_lim" not in rsz.data_aug_conf
    resize, dims, crop, flip, rot = sample_augmentation(
        {"data_aug_conf": rsz.data_aug_conf}, is_train=False)
    assert dims == (int(480 * resize), int(300 * resize))
    assert not flip and rot == 0.0
