#!/usr/bin/env python
"""Robot contact-geometry explorer (reference: explore_robot_meshes.ipynb).

The reference views the raw OBJ meshes in open3d; this framework models
robots as voxel-downsampled contact-point clouds with geometric driving-part
masks (robots.py).  This example renders all three presets side by side
with their driving parts colored — headless matplotlib instead of open3d.

Usage:
    python examples/explore_robot_contacts.py [--voxel 0.11] [--out robots.png]
    python examples/explore_robot_contacts.py --mesh path/to/robot.obj
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--voxel", type=float, default=0.11)
    p.add_argument("--mesh", default=None, help="optional OBJ to inspect")
    p.add_argument("--out", default="robots.png")
    args = p.parse_args()

    from monoforce_tpu.robots import (
        driving_part_masks, load_obj_vertices, robot_point_cloud,
        voxel_downsample,
    )

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if args.mesh:
        pts = voxel_downsample(load_obj_vertices(args.mesh), args.voxel)
        robots = [("mesh", pts)]
    else:
        robots = [(name, robot_point_cloud(name, args.voxel))
                  for name in ("tradr", "marv", "husky")]

    fig = plt.figure(figsize=(6 * len(robots), 5.5))
    colors = ["tab:red", "tab:blue", "tab:green", "tab:orange"]
    for i, (name, pts) in enumerate(robots):
        ax = fig.add_subplot(1, len(robots), i + 1, projection="3d")
        try:
            masks, size = driving_part_masks(name, pts)
        except ValueError:
            masks, size = np.zeros((0, len(pts)), bool), (0, 0)
        body = ~masks.any(axis=0) if masks.size else np.ones(len(pts), bool)
        ax.scatter(pts[body, 0], pts[body, 1], pts[body, 2], s=12, c="gray",
                   label="body")
        for k in range(masks.shape[0]):
            m = masks[k]
            ax.scatter(pts[m, 0], pts[m, 1], pts[m, 2], s=16,
                       c=colors[k % 4], label=f"part {k}")
        ax.set_title(f"{name}: {len(pts)} pts @ {args.voxel} m voxel\n"
                     f"size {size[0]:.2f} x {size[1]:.2f} m")
        ax.legend(loc="upper left", fontsize=7)
        ax.set_box_aspect((1, 1, 0.5))
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(args.out)


if __name__ == "__main__":
    main()
