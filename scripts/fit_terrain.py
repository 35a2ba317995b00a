#!/usr/bin/env python
"""Inverse-physics demo: recover elevation + friction from a trajectory
(reference: monoforce/scripts/fit_terrain.py).

Simulates ground-truth rollouts on a synthetic gaussian hill, then optimizes
a flat terrain estimate by gradient descent through the rollout.
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
    p.add_argument("--n_iters", type=int, default=100)
    p.add_argument("--n_trajs", type=int, default=8)
    p.add_argument("--lr_z", type=float, default=0.02)
    p.add_argument("--lr_friction", type=float, default=0.01)
    p.add_argument("--tv_weight", type=float, default=0.0)
    p.add_argument("--traj_sim_time", type=float, default=3.0)
    p.add_argument("--out", default="fit_terrain.png")
    args = p.parse_args()

    from monoforce_tpu.config import PhysicsConfig
    from monoforce_tpu.physics.controls import generate_controls
    from monoforce_tpu.physics.engine import RobotModel, rollout
    from monoforce_tpu.training import fit_terrain

    cfg = PhysicsConfig(robot="tradr", grid_res=0.4,
                        traj_sim_time=args.traj_sim_time)
    robot = RobotModel.from_config(cfg)
    gx, gy = cfg.grid_coords()
    z_true = (0.5 * np.exp(-((gx - 1.5) ** 2) / 2 - gy ** 2 / 3)).astype(np.float32)

    controls, ts = generate_controls(jax.random.PRNGKey(0), args.n_trajs,
                                     cfg.traj_sim_time, cfg.dt,
                                     v_range=(0.3, 1.0), w_range=(-0.5, 0.5))
    zb = jnp.broadcast_to(jnp.asarray(z_true), (args.n_trajs,) + z_true.shape)
    states_gt, _, _ = rollout(robot, zb, controls, return_forces=False)
    tsb = jnp.tile(ts[None], (args.n_trajs, 1))

    params, losses = fit_terrain(cfg, controls, [states_gt.x], tsb, tsb,
                                 n_iters=args.n_iters, lr_z=args.lr_z,
                                 lr_friction=args.lr_friction,
                                 tv_weight=args.tv_weight, verbose=True)
    print(f"loss: {losses[0]:.5f} -> {losses[-1]:.5f}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, (title, img) in zip(axes, [
            ("true terrain", z_true),
            ("fitted terrain", np.asarray(params.z_grid)),
            ("fitted friction", np.asarray(params.friction))]):
        im = ax.imshow(img.T, origin="lower", cmap="terrain")
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.8)
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print("saved", args.out)


if __name__ == "__main__":
    main()
