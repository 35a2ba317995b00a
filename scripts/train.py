#!/usr/bin/env python
"""Train the terrain encoder end-to-end with the differentiable-physics loss.

Reference parity: monoforce/scripts/train.py CLI (defaults at train.py:23-40;
production hyperparameters in scripts/train.sh: bsz 24, terrain weight 3.0,
phys weight 4.0).
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os

import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description="Train MonoForce-TPU LSS model")
    p.add_argument("--data_dir", type=str, required=True,
                   help="directory containing ROUGH/<sequence> dirs")
    p.add_argument("--bsz", type=int, default=4)
    p.add_argument("--nepochs", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--robot", type=str, default="marv")
    p.add_argument("--lss_cfg_path", type=str, default=None)
    p.add_argument("--pretrained_model_path", type=str, default=None)
    p.add_argument("--debug", action="store_true", help="small datasets")
    p.add_argument("--geom_weight", type=float, default=1.0)
    p.add_argument("--terrain_weight", type=float, default=2.0)
    p.add_argument("--phys_weight", type=float, default=1.0)
    p.add_argument("--traj_sim_time", type=float, default=5.0)
    p.add_argument("--dphys_grid_res", type=float, default=0.4)
    p.add_argument("--log_dir", type=str, default="runs/lss")
    return p.parse_args()


def main():
    args = parse_args()
    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH, rough_seq_dirs
    from monoforce_tpu.training import Trainer
    from monoforce_tpu.utils import NumpyLoader, compile_data

    dphys_cfg = PhysicsConfig(robot=args.robot, grid_res=args.dphys_grid_res,
                              traj_sim_time=args.traj_sim_time)
    lss_cfg = (LSSConfig.from_yaml(args.lss_cfg_path)
               if args.lss_cfg_path else LSSConfig())
    lss_dict = {"data_aug_conf": lss_cfg.data_aug_conf,
                "grid_conf": lss_cfg.grid_conf,
                "soft_classes": lss_cfg.soft_classes}

    seqs = rough_seq_dirs(args.data_dir)
    assert seqs, f"no ROUGH sequences under {args.data_dir}"

    def Data(path, is_train=False):
        return ROUGH(path, lss_cfg=lss_dict, dphys_cfg=dphys_cfg,
                     is_train=is_train)

    train_ds, val_ds = compile_data(seqs, Data, small_data=args.debug)
    train_loader = NumpyLoader(train_ds, batch_size=args.bsz, shuffle=True)
    val_loader = NumpyLoader(val_ds, batch_size=args.bsz)

    trainer = Trainer(dphys_cfg=dphys_cfg, lss_cfg=lss_cfg, lr=args.lr,
                      geom_weight=args.geom_weight,
                      terrain_weight=args.terrain_weight,
                      phys_weight=args.phys_weight, log_dir=args.log_dir,
                      pretrained=args.pretrained_model_path)
    # config snapshots (train.py:188-190)
    dphys_cfg.to_yaml(os.path.join(args.log_dir, "dphys_cfg.yaml"))
    lss_cfg.to_yaml(os.path.join(args.log_dir, "lss_cfg.yaml"))

    batch0 = next(iter(train_loader))
    trainer.init_state(tuple(jnp.asarray(b) for b in batch0))
    trainer.train(train_loader, val_loader, n_epochs=args.nepochs)


if __name__ == "__main__":
    main()
