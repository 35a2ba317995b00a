"""Synthetic ROUGH-layout sequence builder for dataset tests (no real data in
this environment; the directory schema matches the reference docs/DATA.md)."""

import os

import numpy as np
import yaml
from PIL import Image


def _yaml_dump(obj, path):
    with open(path, "w") as f:
        yaml.safe_dump(obj, f)


def make_sequence(root, n_frames=4, img_hw=(60, 80), cameras=("camera_left",
                  "camera_front", "camera_right", "camera_rear"), seed=0):
    """Create a fake sequence directory; returns its path."""
    rng = np.random.default_rng(seed)
    seq = os.path.join(root, "ROUGH", "fake_2024-01-01-00-00-00")
    for sub in ("clouds", "poses", "controls", "images",
                "images/wildscenes_seg/seg", "calibration/cameras"):
        os.makedirs(os.path.join(seq, sub), exist_ok=True)

    H, W = img_hw
    # stamps at 5 Hz starting from t=100.0; ids use the <sec>_<nsec> scheme
    stamps = 100.0 + 0.2 * np.arange(n_frames)
    ids = [f"{int(s)}_{int(round((s - int(s)) * 1e9)):09d}" for s in stamps]

    # clouds: ground plane + a bump, in lidar frame
    for sid in ids:
        pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
        pts[:, 2] = 0.05 * rng.standard_normal(2000)
        bump = (np.abs(pts[:, 0] - 2) < 0.5) & (np.abs(pts[:, 1]) < 0.5)
        pts[bump, 2] += 0.4
        np.savez(os.path.join(seq, "clouds", f"{sid}.npz"), cloud=pts)

    # poses at 10 Hz: drive straight in x at 0.5 m/s
    pose_ts = 100.0 + 0.1 * np.arange(n_frames * 2 + 20)
    rows = []
    for t in pose_ts:
        T = np.eye(4)
        T[0, 3] = 0.5 * (t - 100.0)
        rows.append([t] + T[:3, :4].reshape(-1).tolist())
    header = "stamp," + ",".join(f"p{i}" for i in range(12))
    np.savetxt(os.path.join(seq, "poses", "lidar_poses.csv"),
               np.asarray(rows), delimiter=",", header=header, comments="")

    # controls at 10 Hz: constant (0.5, 0.1)
    crows = [[t, 0.5, 0.1] for t in pose_ts]
    np.savetxt(os.path.join(seq, "controls", "cmd_vel.csv"),
               np.asarray(crows), delimiter=",", header="stamp,v,w", comments="")

    # calibration
    K = [50.0, 0.0, W / 2, 0.0, 50.0, H / 2, 0.0, 0.0, 1.0]
    for cam in cameras:
        _yaml_dump({"camera_matrix": {"rows": 3, "cols": 3, "data": K}},
                   os.path.join(seq, "calibration", "cameras", f"{cam}.yaml"))
    eye = np.eye(4)
    # cameras look forward along +x: standard optical frame (z forward)
    R_opt = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=float)
    T_cam = np.eye(4)
    T_cam[:3, :3] = R_opt
    trans = {
        "T_base_link__os_sensor": {"rows": 4, "cols": 4,
                                   "data": eye.reshape(-1).tolist()},
        "T_base_link__base_footprint": {
            "rows": 4, "cols": 4,
            "data": np.diag([1.0, 1, 1, 1]).reshape(-1).tolist()},
    }
    trans["T_base_link__base_footprint"]["data"][11] = -0.1  # z clearance
    for cam in cameras:
        trans[f"T_base_link__{cam}"] = {"rows": 4, "cols": 4,
                                        "data": T_cam.reshape(-1).tolist()}
    _yaml_dump(trans, os.path.join(seq, "calibration", "transformations.yaml"))

    # images + segmentation labels
    for sid in ids:
        for cam in cameras:
            img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(seq, "images", f"{sid}_{cam}.png"))
            seg = np.full((H, W), 3, np.uint8)  # grass (soft)
            seg[:, W // 2:] = 9                 # rock (rigid)
            Image.fromarray(seg).save(
                os.path.join(seq, "images", "wildscenes_seg", "seg",
                             f"{sid}_{cam}.png"))
    return seq


def tiny_lss_cfg(img_hw=(60, 80)):
    H, W = img_hw
    return {
        # final_dim must be divisible by 32 (the /32 endpoint upsamples x2
        # back onto the /16 grid, like the reference's 256x416)
        "data_aug_conf": {"H": H, "W": W, "final_dim": (32, 64),
                          "resize_lim": (0.8, 0.9), "bot_pct_lim": (0.0, 0.0),
                          "rot_lim": (-3.0, 3.0), "rand_flip": True},
        "grid_conf": {"xbound": (-6.4, 6.4, 0.1), "ybound": (-6.4, 6.4, 0.1),
                      "zbound": (-3.2, 3.2, 6.4), "dbound": (0.6, 3.0, 0.2)},
        "soft_classes": ("tree-foliage", "bush", "grass", "sky", "unlabelled"),
    }
