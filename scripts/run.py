#!/usr/bin/env python
"""Single-shot end-to-end inference (reference: monoforce/scripts/run.py):
images + calibration -> LSS terrain -> shoot sampled controls -> visualize
the paths and the selected one.
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import jax
import jax.numpy as jnp
import numpy as np


def _inputs_from_images(img_paths, calib_path, cameras, lss_cfg):
    """Build the six LSS input arrays straight from image files +
    a calibration directory — the reference run.py CLI contract
    (reference scripts/run.py:91-131: val augmentation on the RAW image,
    per-camera K, extrinsics ``T_base_link__<cam>`` with NO gravity
    alignment)."""
    from PIL import Image

    from monoforce_tpu.datasets.augment import (
        img_transform, normalize_img, sample_augmentation,
    )
    from monoforce_tpu.utils.io import load_calib

    calib = load_calib(calib_path)
    if calib is None:
        raise SystemExit(f"no camera calibration found under {calib_path}")
    if cameras is None:
        cameras = sorted(k for k in calib if k.startswith("camera_")
                         and k != "camera_up")
    if len(cameras) != len(img_paths):
        raise SystemExit(f"{len(img_paths)} images for {len(cameras)} "
                         f"cameras ({cameras})")

    lss_dict = {"data_aug_conf": lss_cfg.data_aug_conf,
                "grid_conf": lss_cfg.grid_conf}
    imgs, rots, trans, intrins, post_rots, post_trans = [], [], [], [], [], []
    for cam, img_path in zip(cameras, img_paths):
        img = Image.open(img_path)
        K = np.asarray(calib[cam]["camera_matrix"]["data"],
                       dtype=np.float32).reshape(3, 3)
        aug = sample_augmentation(lss_dict, is_train=False)
        img, post_rot2, post_tran2 = img_transform(
            img, np.eye(2, dtype=np.float32),
            np.zeros(2, dtype=np.float32), *aug)
        post_rot = np.eye(3, dtype=np.float32)
        post_tran = np.zeros(3, dtype=np.float32)
        post_rot[:2, :2] = post_rot2
        post_tran[:2] = post_tran2
        E = np.asarray(calib["transformations"][f"T_base_link__{cam}"]["data"],
                       dtype=np.float32).reshape(4, 4)
        imgs.append(normalize_img(img))
        rots.append(E[:3, :3])
        trans.append(E[:3, 3])
        intrins.append(K)
        post_rots.append(post_rot)
        post_trans.append(post_tran)
    return [np.stack(a).astype(np.float32) for a in
            (imgs, rots, trans, intrins, post_rots, post_trans)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq_dir", type=str, default=None,
                   help="one ROUGH sequence directory")
    p.add_argument("--img-paths", type=str, nargs="+", default=None,
                   help="input RGB image paths (reference run.py CLI mode; "
                        "use with --calibration-path)")
    p.add_argument("--calibration-path", type=str, default=None,
                   help="calibration dir with cameras/*.yaml + "
                        "transformations.yaml")
    p.add_argument("--cameras", type=str, nargs="+", default=None,
                   help="camera names matching --img-paths order")
    p.add_argument("--lss_cfg_path", type=str, default=None,
                   help="LSS config YAML (defaults to built-in config)")
    p.add_argument("--lss_preset", type=str, default="default",
                   choices=("default", "resize"),
                   help="named encoder geometry: 'default' (lss_cfg.yaml) "
                        "or 'resize' (the online 480x300 "
                        "lss_cfg_resize.yaml / img_preproc.launch pipeline)")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--robot", type=str, default="tradr")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--n_trajs", type=int, default=64)
    p.add_argument("--half", action="store_true",
                   help="serving precision: bf16 camera trunk (2.0x encoder "
                        "latency on TPU; ~5 mm terrain RMSE, measured+gated)")
    p.add_argument("--out", type=str, default="run_result.png")
    args = p.parse_args()
    if (args.seq_dir is None) == (args.img_paths is None):
        p.error("exactly one of --seq_dir or --img-paths is required")
    if args.img_paths is not None and args.calibration_path is None:
        p.error("--img-paths needs --calibration-path")

    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.pipeline import MonoForce
    from monoforce_tpu.vis import plot_terrain_with_trajs

    dphys_cfg = PhysicsConfig(robot=args.robot)
    dphys_cfg.n_sim_trajs = args.n_trajs
    lss_cfg = (LSSConfig.from_yaml(args.lss_cfg_path)
               if args.lss_cfg_path else LSSConfig.preset(args.lss_preset))
    if args.img_paths is not None:
        data = _inputs_from_images(args.img_paths, args.calibration_path,
                                   args.cameras, lss_cfg)
    else:
        lss_dict = {"data_aug_conf": lss_cfg.data_aug_conf,
                    "grid_conf": lss_cfg.grid_conf,
                    "soft_classes": lss_cfg.soft_classes}
        ds = ROUGH(args.seq_dir, lss_cfg=lss_dict, dphys_cfg=dphys_cfg)
        data = ds.get_images_data(args.index)
    imgs, rots, trans, intrins, post_rots, post_trans = [
        jnp.asarray(a)[None] for a in data]

    mf = MonoForce(dphys_cfg=dphys_cfg, lss_cfg=lss_cfg, half=args.half)
    if args.checkpoint:
        import orbax.checkpoint as ocp
        import os
        stored = ocp.StandardCheckpointer().restore(os.path.abspath(args.checkpoint))
        mf.params = {"params": stored["params"],
                     "batch_stats": stored["batch_stats"]}
    else:
        mf.init_params((imgs, rots, trans, intrins, post_rots, post_trans))

    terrain, plan = mf.run(imgs, rots, trans, intrins, post_rots, post_trans,
                           key=jax.random.PRNGKey(0))
    print(f"best path: {int(plan.best)}  cost: {float(plan.costs[plan.best]):.4f}")
    out = plot_terrain_with_trajs(np.asarray(terrain["terrain"])[0, 0],
                                  plan.xs, plan.costs, dphys_cfg.d_max,
                                  best=int(plan.best), path=args.out)
    print("saved", out)


if __name__ == "__main__":
    main()
