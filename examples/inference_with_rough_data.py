#!/usr/bin/env python
"""MonoForce inference on ROUGH data
(reference: examples/monoforce_inference_with_rough_data.ipynb).

Loads a ROUGH sample — by default the reference's own committed real marv
frame — and runs the full pipeline the notebook demonstrates: images ->
LSS terrain prediction -> trajectory shooting over the predicted terrain ->
best path, then renders the predicted terrain/friction with the sampled
and selected trajectories (notebook cells 13-22).

The notebook loads pretrained ``val.pth`` weights from a release download;
no network access exists in this environment, so by default the model runs
fresh-initialized (the pipeline is identical).  Pass ``--weights`` to load
a real torch checkpoint through the state-dict port
(``models/terrain_encoder/torch_port.py``).

Usage:
    python examples/inference_with_rough_data.py [--sequence PATH]
        [--weights val.pth] [--n-trajs 32] [--out inference.png] [--cpu]
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

REF_SAMPLE = "/root/reference/monoforce/config/data_sample/marv"
REF_LSS_YAML = "/root/reference/monoforce/config/lss_cfg.yaml"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sequence", default=None, help="ROUGH sequence dir")
    p.add_argument("--weights", default=None,
                   help="optional torch .pth state dict (reference release "
                        "weights) loaded via torch_port")
    p.add_argument("--n-trajs", type=int, default=32)
    p.add_argument("--small", action="store_true",
                   help="tiny encoder dims (tractable on CPU)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="inference.png")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.pipeline import MonoForce
    from monoforce_tpu.utils.io import read_yaml

    if args.sequence:
        seq = args.sequence
    else:
        if not os.path.isdir(REF_SAMPLE):
            raise SystemExit("no --sequence given and the reference "
                             "data_sample is not present")
        tmp = tempfile.mkdtemp(prefix="inference_")
        seq = os.path.join(tmp, "marv")
        shutil.copytree(REF_SAMPLE, seq)  # loaders write caches; ref is RO

    lss_dict = read_yaml(REF_LSS_YAML)
    if args.small:
        lss_dict["data_aug_conf"]["final_dim"] = (32, 64)
        lss_dict["grid_conf"]["dbound"] = [0.6, 3.0, 0.2]
    dcfg = PhysicsConfig(robot="marv")
    dcfg.n_sim_trajs = args.n_trajs
    ds = ROUGH(seq, lss_cfg=lss_dict, dphys_cfg=dcfg)
    inputs = tuple(jnp.asarray(a)[None] for a in ds.get_images_data(0))

    lss_cfg = LSSConfig(data_aug_conf=lss_dict["data_aug_conf"],
                        grid_conf=lss_dict["grid_conf"],
                        soft_classes=lss_dict["soft_classes"])
    mf = MonoForce(dphys_cfg=dcfg, lss_cfg=lss_cfg)
    if args.weights:
        mf.load_torch_checkpoint(args.weights)
    else:
        mf.init_params(inputs)
    terrain, plan = mf.run(*inputs, key=jax.random.PRNGKey(0))
    best = int(np.argmin(np.asarray(plan.costs)))
    print(f"terrain: {np.asarray(terrain['terrain']).shape}, "
          f"{args.n_trajs} sampled trajectories, best #{best} "
          f"(cost {float(plan.costs[best]):.4f})")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = float(dcfg.d_max)
    ext = (-d, d, -d, d)
    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    im = axes[0].imshow(np.asarray(terrain["terrain"])[0, 0].T,
                        cmap="terrain", origin="lower", extent=ext)
    axes[0].set_title("predicted terrain")
    fig.colorbar(im, ax=axes[0], shrink=0.8, label="z [m]")
    im = axes[1].imshow(np.asarray(terrain["friction"])[0, 0].T,
                        cmap="viridis", origin="lower", extent=ext)
    axes[1].set_title("predicted friction")
    fig.colorbar(im, ax=axes[1], shrink=0.8)
    im = axes[2].imshow(np.asarray(terrain["terrain"])[0, 0].T,
                        cmap="terrain", origin="lower", extent=ext)
    xs = np.asarray(plan.xs)
    for t in range(xs.shape[0]):
        axes[2].plot(xs[t, :, 0], xs[t, :, 1], "-", color="w", alpha=0.25,
                     lw=0.8)
    axes[2].plot(xs[best, :, 0], xs[best, :, 1], "-", color="r", lw=2.0,
                 label=f"best (cost {float(plan.costs[best]):.3f})")
    axes[2].legend(loc="upper right")
    axes[2].set_title("sampled trajectories over predicted terrain")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(args.out)


if __name__ == "__main__":
    main()
