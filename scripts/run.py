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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq_dir", type=str, required=True,
                   help="one ROUGH sequence directory")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--robot", type=str, default="tradr")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--n_trajs", type=int, default=64)
    p.add_argument("--half", action="store_true",
                   help="serving precision: bf16 camera trunk (2.0x encoder "
                        "latency on TPU; ~5 mm terrain RMSE, measured+gated)")
    p.add_argument("--out", type=str, default="run_result.png")
    args = p.parse_args()

    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.pipeline import MonoForce
    from monoforce_tpu.vis import plot_terrain_with_trajs

    dphys_cfg = PhysicsConfig(robot=args.robot)
    dphys_cfg.n_sim_trajs = args.n_trajs
    lss_cfg = LSSConfig()
    lss_dict = {"data_aug_conf": lss_cfg.data_aug_conf,
                "grid_conf": lss_cfg.grid_conf,
                "soft_classes": lss_cfg.soft_classes}
    ds = ROUGH(args.seq_dir, lss_cfg=lss_dict, dphys_cfg=dphys_cfg)
    imgs, rots, trans, intrins, post_rots, post_trans = [
        jnp.asarray(a)[None] for a in ds.get_images_data(args.index)]

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
