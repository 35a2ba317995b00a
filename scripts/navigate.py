#!/usr/bin/env python
"""Closed-loop navigation demo: plan -> select -> follow -> simulate ->
replan on the differentiable engine (the reference's
husky_gazebo_monoforce.launch integration without Gazebo/ROS).

Run: python scripts/navigate.py [--terrain hill] [--out navigate.png]
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
    p.add_argument("--terrain", default="hill", choices=["hill", "flat", "ridge"])
    p.add_argument("--n_trajs", type=int, default=64)
    p.add_argument("--max_time", type=float, default=40.0)
    p.add_argument("--out", default="navigate.png")
    args = p.parse_args()

    import jax.numpy as jnp

    from monoforce_tpu.config import PhysicsConfig
    from monoforce_tpu.planner.navigator import navigate

    cfg = PhysicsConfig.for_planner("tradr")
    gx, gy = cfg.grid_coords()
    if args.terrain == "hill":
        z = 0.4 * np.exp(-((gx - 2.0) ** 2 / 4.0 + gy ** 2 / 8.0))
    elif args.terrain == "ridge":
        z = 0.35 * np.exp(-(gy ** 2) / 0.8) * (np.abs(gx - 2.0) < 2.0)
    else:
        z = np.zeros_like(gx)
    z = jnp.asarray(z.astype(np.float32))
    waypoints = np.asarray([[2.0, -1.5, 0.0], [4.0, 0.5, 0.0]])

    res = navigate(cfg, z, waypoints, n_trajs=args.n_trajs,
                   max_time=args.max_time, verbose=True)
    print(f"route {'completed' if res.reached else 'TIMED OUT'} after "
          f"{res.times[-1]:.1f} s, {len(res.plans)} replans")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 7))
    d = float(cfg.d_max)
    im = ax.imshow(np.asarray(z).T, origin="lower", cmap="terrain",
                   extent=(-d, d, -d, d))
    fig.colorbar(im, ax=ax, label="elevation [m]")
    for t, paths, costs, best in res.plans:
        ax.plot(paths[best, :, 0], paths[best, :, 1], "b-", lw=0.7, alpha=0.4)
    ax.plot(res.positions[:, 0], res.positions[:, 1], "k-", lw=2.5,
            label="driven")
    ax.plot(waypoints[:, 0], waypoints[:, 1], "r*", ms=16, label="waypoints")
    ax.legend()
    ax.set_title(f"closed-loop navigation ({args.terrain})")
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(args.out)


if __name__ == "__main__":
    main()
