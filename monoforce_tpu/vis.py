"""Matplotlib visualization helpers (headless-friendly).

Reference parity: monoforce/src/monoforce/vis.py + the mayavi rollout
animation on the engine (dphysics.py:607-669) and the trainer's prediction
figure (train.py:248-357).  Mayavi is replaced by matplotlib 3D/2D figures
that save to PNG — appropriate for a TPU-side framework without a display.
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_terrain_with_trajs", "plot_rollout_3d",
           "save_prediction_figure", "explore_sample"]


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_terrain_with_trajs(z_grid, trajs, costs=None, d_max: float = 6.4,
                            best: int | None = None, path: str | None = None):
    """Top-down heightmap with sampled trajectories colored by cost.

    z_grid: (H, W); trajs: (B, N, 3); costs: (B,).
    """
    plt = _mpl()
    z = np.asarray(z_grid)
    fig, ax = plt.subplots(figsize=(7, 6))
    im = ax.imshow(z.T, origin="lower", extent=(-d_max, d_max, -d_max, d_max),
                   cmap="terrain")
    fig.colorbar(im, ax=ax, label="elevation [m]")
    trajs = np.asarray(trajs)
    if costs is not None:
        costs = np.asarray(costs)
        order = np.argsort(costs)[::-1]
        cmin, cmax = costs.min(), costs.max() + 1e-9
        for i in order:
            c = plt.cm.RdYlGn(1.0 - (costs[i] - cmin) / (cmax - cmin))
            ax.plot(trajs[i, :, 0], trajs[i, :, 1], color=c, lw=0.8, alpha=0.7)
    else:
        for t in trajs:
            ax.plot(t[:, 0], t[:, 1], "b-", lw=0.8, alpha=0.5)
    if best is not None:
        ax.plot(trajs[best, :, 0], trajs[best, :, 1], "k-", lw=2.5,
                label="selected")
        ax.legend()
    ax.set_xlabel("x [m]"); ax.set_ylabel("y [m]")
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def plot_rollout_3d(z_grid, xs, d_max: float = 6.4, stride: int = 4,
                    path: str | None = None):
    """3D surface + trajectory line (the mayavi animation's static stand-in)."""
    plt = _mpl()
    z = np.asarray(z_grid)
    H, W = z.shape
    gx, gy = np.meshgrid(np.linspace(-d_max, d_max, H),
                         np.linspace(-d_max, d_max, W), indexing="ij")
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot_surface(gx[::stride, ::stride], gy[::stride, ::stride],
                    z[::stride, ::stride], cmap="terrain", alpha=0.6)
    xs = np.asarray(xs)
    ax.plot(xs[:, 0], xs[:, 1], xs[:, 2], "g-", lw=2)
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig


def save_prediction_figure(terrain: dict, hm_geom, hm_terrain, xs_pred, xs_gt,
                           d_max: float = 6.4, path: str = "prediction.png"):
    """2x3 panel: predicted/label heightmaps, friction, trajectories
    (compact version of the trainer figure, train.py:248-357)."""
    plt = _mpl()
    fig, axes = plt.subplots(2, 3, figsize=(15, 9))
    panels = [
        ("pred terrain", np.asarray(terrain["terrain"])[0, 0]),
        ("label terrain", np.asarray(hm_terrain)[0]),
        ("pred friction", np.asarray(terrain["friction"])[0, 0]),
        ("pred geom", np.asarray(terrain["geom"])[0, 0]),
        ("label geom", np.asarray(hm_geom)[0]),
    ]
    for ax, (title, img) in zip(axes.flat, panels):
        im = ax.imshow(img.T, origin="lower", cmap="jet",
                       extent=(-d_max, d_max, -d_max, d_max))
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.7)
    ax = axes.flat[5]
    xs_pred, xs_gt = np.asarray(xs_pred), np.asarray(xs_gt)
    ax.plot(xs_gt[:, 0], xs_gt[:, 1], "k-", label="GT")
    ax.plot(xs_pred[:, 0], xs_pred[:, 1], "r-", label="pred")
    ax.set_title("trajectories"); ax.legend(); ax.grid()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def explore_sample(sample, d_max: float = 6.4, path: str = "sample.png"):
    """Dataset-sample explorer (reference: utils.py:191-297 explore_data):
    camera images, geom/terrain heightmap labels and the GT trajectory in
    one figure.  ``sample`` is the 16-tuple from ROUGH.get_sample."""
    plt = _mpl()
    (imgs, rots, trans, intrins, post_rots, post_trans,
     hm_geom, hm_terrain, control_ts, controls, pose0,
     traj_ts, Xs, Xds, Rs, Omegas) = sample
    from monoforce_tpu.datasets.augment import denormalize_img

    n_cams = len(imgs)
    fig, axes = plt.subplots(2, max(n_cams, 3), figsize=(4 * max(n_cams, 3), 8))
    for i in range(n_cams):
        axes[0, i].imshow(denormalize_img(np.asarray(imgs[i])))
        axes[0, i].set_title(f"camera {i}")
        axes[0, i].axis("off")
    for i in range(n_cams, axes.shape[1]):
        axes[0, i].axis("off")

    for j, (title, hm) in enumerate([("geom label", hm_geom),
                                     ("terrain label", hm_terrain)]):
        ax = axes[1, j]
        im = ax.imshow(np.asarray(hm[0]).T, origin="lower", cmap="jet",
                       extent=(-d_max, d_max, -d_max, d_max))
        ax.plot(np.asarray(Xs)[:, 0], np.asarray(Xs)[:, 1], "k-", lw=2)
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.7)
    ax = axes[1, 2]
    ax.plot(np.asarray(traj_ts), np.asarray(Xs)[:, 2], "k-")
    ax.set_title("trajectory z(t)")
    ax.grid()
    for i in range(3, axes.shape[1]):
        axes[1, i].axis("off")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path
