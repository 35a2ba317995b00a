#!/usr/bin/env python
"""Visual dataset explorer (reference: utils.py:191-297 explore_data):
render camera images, heightmap labels and the GT trajectory of a sample
to a PNG for inspection.
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq_dir", type=str, required=True)
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--robot", type=str, default="tradr")
    p.add_argument("--out", type=str, default="sample.png")
    args = p.parse_args()

    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.vis import explore_sample

    lss_cfg = LSSConfig()
    lss_dict = {"data_aug_conf": lss_cfg.data_aug_conf,
                "grid_conf": lss_cfg.grid_conf,
                "soft_classes": lss_cfg.soft_classes}
    dphys_cfg = PhysicsConfig(robot=args.robot)
    ds = ROUGH(args.seq_dir, lss_cfg=lss_dict, dphys_cfg=dphys_cfg)
    print(f"sequence {ds.name}: {len(ds)} samples, cameras {ds.camera_names}")
    out = explore_sample(ds[args.index], d_max=dphys_cfg.d_max, path=args.out)
    print("saved", out)


if __name__ == "__main__":
    main()
