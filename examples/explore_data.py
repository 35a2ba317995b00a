#!/usr/bin/env python
"""ROUGH data exploration example
(reference: examples/explore_data_rgb_rigid_terrain.ipynb).

Loads a ROUGH sequence — by default the reference's own committed real
sensor sample (``config/data_sample/marv``) when present, else the
synthetic test fixture — and renders what the notebook shows: the RGB
camera images, the rigid-terrain heightmap label, the labeled-area mask,
and the robot trajectory overlaid on the grid (notebook cells 6-10; the
``%matplotlib`` viewer replaced by a saved headless figure).

Usage:
    python examples/explore_data.py [--sequence PATH] [--robot marv]
                                    [--index 0] [--out explore_data.png]
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python examples/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)

import argparse
import os
import shutil
import tempfile

import numpy as np

REF_SAMPLE = "/root/reference/monoforce/config/data_sample"
REF_LSS_YAML = "/root/reference/monoforce/config/lss_cfg.yaml"


def resolve_sequence(args):
    """The reference sample dirs are read-only; loaders write caches, so
    real samples are copied to tmp first (same as tests/test_realdata.py)."""
    if args.sequence:
        return args.sequence, None
    src = os.path.join(REF_SAMPLE, args.robot)
    if os.path.isdir(src):
        tmp = tempfile.mkdtemp(prefix="explore_data_")
        dst = os.path.join(tmp, args.robot)
        shutil.copytree(src, dst)
        return dst, REF_LSS_YAML
    # no real data in this environment: synthesize the fixture sequence
    _sys.path.insert(0, os.path.join(_REPO, "tests"))
    from fixtures import make_sequence
    return make_sequence(tempfile.mkdtemp(prefix="explore_fix_"),
                         n_frames=2), None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sequence", default=None, help="ROUGH sequence dir")
    p.add_argument("--robot", default="marv", choices=["marv", "tradr"])
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", default="explore_data.png")
    args = p.parse_args()

    from monoforce_tpu.config import PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.datasets.augment import denormalize_img
    from monoforce_tpu.utils.io import read_yaml

    seq, lss_yaml = resolve_sequence(args)
    if lss_yaml:
        lss_cfg = read_yaml(lss_yaml)
    else:
        _sys.path.insert(0, os.path.join(_REPO, "tests"))
        from fixtures import tiny_lss_cfg
        lss_cfg = tiny_lss_cfg()
    ds = ROUGH(seq, lss_cfg=lss_cfg, dphys_cfg=PhysicsConfig(robot=args.robot))
    i = args.index % len(ds)
    print(f"sequence: {seq}  ({len(ds)} samples; showing {i})")

    # the 16-tuple training contract (reference rough.py:620-663)
    (imgs, rots, trans, intrins, post_rots, post_trans, hm_geom, hm_terrain,
     control_ts, controls, pose0, traj_ts, Xs, Xds, Rs, Omegas) = ds[i]
    print(f"RGB images: {imgs.shape}  (N cams, C, H, W)")
    print(f"terrain heightmap + mask: {hm_terrain.shape}")
    grid_res = lss_cfg["grid_conf"]["xbound"][2]
    H, W = hm_terrain.shape[1:]
    print(f"grid: {H}x{W} at {grid_res} m")

    poses = ds.get_traj(i)["poses"]
    x_grid = poses[:, 0, 3] / grid_res + H // 2
    y_grid = poses[:, 1, 3] / grid_res + W // 2

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_cams = imgs.shape[0]
    fig, axes = plt.subplots(2, max(n_cams, 3),
                             figsize=(4.2 * max(n_cams, 3), 8))
    for c in range(n_cams):
        axes[0, c].imshow(np.asarray(denormalize_img(imgs[c])))
        axes[0, c].set_title(ds.camera_names[c])
        axes[0, c].axis("off")
    for c in range(n_cams, axes.shape[1]):
        axes[0, c].axis("off")

    im = axes[1, 0].imshow(hm_terrain[0], cmap="terrain", origin="lower")
    axes[1, 0].plot(y_grid, x_grid, "r-", lw=1.5, label="trajectory")
    axes[1, 0].set_title("terrain heightmap label")
    axes[1, 0].legend(loc="upper right")
    fig.colorbar(im, ax=axes[1, 0], shrink=0.8, label="z [m]")
    axes[1, 1].imshow(hm_terrain[1], cmap="gray", origin="lower")
    axes[1, 1].plot(y_grid, x_grid, "r-", lw=1.5)
    axes[1, 1].set_title("labeled-area mask (traj footprint)")
    im = axes[1, 2].imshow(hm_geom[0], cmap="terrain", origin="lower")
    axes[1, 2].set_title("geom heightmap (lidar max-z)")
    fig.colorbar(im, ax=axes[1, 2], shrink=0.8, label="z [m]")
    for c in range(3, axes.shape[1]):
        axes[1, c].axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(args.out)


if __name__ == "__main__":
    main()
