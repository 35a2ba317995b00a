#!/usr/bin/env python
"""RGBD exploration example (reference: examples/rgbd_data.ipynb).

Loads an RGB + depth frame pair from a ROUGH sequence's ``luxonis`` folder
(or synthesizes one when no data is available in the environment),
back-projects the depth image to a camera-frame point cloud with the camera
intrinsics, rasterizes a heightmap from it, and saves a summary figure —
the notebook's open3d viewer replaced by headless matplotlib.

Usage:
    python examples/rgbd_data.py [--sequence PATH] [--out rgbd.png]
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os

import numpy as np


def load_or_synthesize(sequence):
    if sequence:
        from PIL import Image
        rgb_dir = os.path.join(sequence, "luxonis", "rgb")
        depth_dir = os.path.join(sequence, "luxonis", "depth")
        rgb_files = sorted(os.listdir(rgb_dir))
        depth_files = sorted(os.listdir(depth_dir))
        i = len(rgb_files) // 2
        rgb = np.asarray(Image.open(os.path.join(rgb_dir, rgb_files[i])))
        depth = np.asarray(Image.open(os.path.join(depth_dir, depth_files[i])))
        import yaml
        with open(os.path.join(sequence, "luxonis", "calibration",
                               "cameras", "camera_front.yaml")) as f:
            K = np.asarray(yaml.safe_load(f)["camera_matrix"]["data"],
                           np.float64).reshape(3, 3)
        return rgb, depth, K
    # synthetic frame: a sloped ground plane with a box obstacle
    H, W = 240, 320
    K = np.asarray([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1.0]])
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth = 2000.0 + 6.0 * (H - yy)           # ground receding with height
    depth[80:140, 140:200] = 1500.0           # box
    rgb = np.stack([xx * 255 // W, yy * 255 // H, np.full_like(xx, 120)],
                   axis=-1).astype(np.uint8)
    return rgb, depth.astype(np.float32), K


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sequence", default=None,
                   help="ROUGH sequence dir with a luxonis/ RGBD folder")
    p.add_argument("--out", default="rgbd.png")
    args = p.parse_args()

    from monoforce_tpu.datasets.camera import depth_to_cloud

    rgb, depth, K = load_or_synthesize(args.sequence)
    cloud = depth_to_cloud(depth, K)
    valid = cloud[:, 2] > 0.1
    cloud = cloud[valid]
    print(f"cloud: {cloud.shape[0]} points, "
          f"z range [{cloud[:, 2].min():.2f}, {cloud[:, 2].max():.2f}] m")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(15, 4.5))
    axes[0].imshow(rgb)
    axes[0].set_title("RGB")
    im = axes[1].imshow(depth, cmap="turbo")
    axes[1].set_title("depth")
    fig.colorbar(im, ax=axes[1], shrink=0.8)
    # top-down scatter colored by height (camera frame: x right, y down,
    # z forward -> plot (x, z) with -y as height)
    sub = cloud[:: max(1, cloud.shape[0] // 20000)]
    sc = axes[2].scatter(sub[:, 0], sub[:, 2], c=-sub[:, 1], s=1,
                         cmap="terrain")
    axes[2].set_xlabel("x [m]"); axes[2].set_ylabel("z forward [m]")
    axes[2].set_title("back-projected cloud (top-down)")
    fig.colorbar(sc, ax=axes[2], shrink=0.8, label="height [m]")
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(args.out)


if __name__ == "__main__":
    main()
