#!/usr/bin/env python
"""Evaluate a trained terrain encoder (reference: monoforce/scripts/eval.py).

Writes per-batch heightmap and trajectory losses to losses.csv and prints
the means.
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--robot", type=str, default="marv")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--lss_cfg_path", type=str, default=None)
    p.add_argument("--bsz", type=int, default=1)
    p.add_argument("--dphys_grid_res", type=float, default=0.4)
    p.add_argument("--traj_sim_time", type=float, default=5.0)
    p.add_argument("--out_dir", type=str, default="runs/eval")
    p.add_argument("--save_figures", action="store_true",
                   help="write the 3x4 per-batch diagnostic panels "
                        "(reference eval.py:159-265)")
    args = p.parse_args()

    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH, rough_seq_dirs
    from monoforce_tpu.models import LiftSplatShoot
    from monoforce_tpu.physics.engine import RobotModel
    from monoforce_tpu.training.evaluator import Evaluator
    from monoforce_tpu.utils import NumpyLoader, compile_data

    dphys_cfg = PhysicsConfig(robot=args.robot, grid_res=args.dphys_grid_res,
                              traj_sim_time=args.traj_sim_time)
    lss_cfg = (LSSConfig.from_yaml(args.lss_cfg_path)
               if args.lss_cfg_path else LSSConfig())
    lss_dict = {"data_aug_conf": lss_cfg.data_aug_conf,
                "grid_conf": lss_cfg.grid_conf,
                "soft_classes": lss_cfg.soft_classes}

    seqs = rough_seq_dirs(args.data_dir)

    def Data(path, is_train=False):
        return ROUGH(path, lss_cfg=lss_dict, dphys_cfg=dphys_cfg,
                     is_train=is_train)

    _, val_ds = compile_data(seqs, Data)
    loader = NumpyLoader(val_ds, batch_size=args.bsz)

    model = LiftSplatShoot(lss_cfg.grid_conf, lss_cfg.data_aug_conf)
    batch0 = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(0),
                           *[jnp.asarray(b) for b in batch0[:6]])
    if args.checkpoint:
        import orbax.checkpoint as ocp
        import os
        stored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.checkpoint))
        variables = {"params": stored["params"],
                     "batch_stats": stored["batch_stats"]}

    pool_k = int(round(dphys_cfg.grid_res / lss_cfg.grid_conf["xbound"][2]))
    ev = Evaluator(model, RobotModel.from_config(dphys_cfg), pool_k,
                   out_dir=args.out_dir)
    means = ev.run(variables, loader, save_figures=args.save_figures,
                   d_max=float(dphys_cfg.d_max))
    print(means)


if __name__ == "__main__":
    main()
