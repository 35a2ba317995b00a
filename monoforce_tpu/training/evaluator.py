"""Validation harness: per-batch heightmap and trajectory metrics -> CSV.

Reference parity: monoforce/scripts/eval.py — geom/terrain heightmap losses
plus trajectory XYZ (translation) and rotation losses computed by rolling the
physics from the GT initial state on the predicted terrain, written per batch
to ``losses.csv`` (eval.py:120,156-157).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from monoforce_tpu.losses import (
    hm_loss, rotation_difference, translation_difference,
)
from monoforce_tpu.physics.engine import RigidState, RobotModel, rollout
from monoforce_tpu.training.trainer import avg_pool_grid

__all__ = ["Evaluator"]


class Evaluator:
    """Runs a trained terrain encoder over a validation loader."""

    def __init__(self, model, robot: RobotModel, pool_k: int = 4,
                 out_dir: str = "runs/eval"):
        self.model = model
        self.robot = robot
        self.pool_k = pool_k
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._step = jax.jit(self._metrics)

    def _metrics(self, variables, batch):
        (imgs, rots, trans, intrins, post_rots, post_trans,
         hm_geom, hm_terrain, control_ts, controls, pose0,
         traj_ts, Xs, Xds, Rs, Omegas) = batch
        terrain = self.model.apply(variables, imgs, rots, trans, intrins,
                                   post_rots, post_trans)
        loss_geom = hm_loss(terrain["geom"], hm_geom[:, 0:1], hm_geom[:, 1:2])
        loss_terrain = hm_loss(terrain["terrain"], hm_terrain[:, 0:1],
                               hm_terrain[:, 1:2])

        # trajectory losses from the GT initial state (eval.py:93-104)
        z = avg_pool_grid(terrain["terrain"], self.pool_k)[:, 0]
        friction = avg_pool_grid(terrain["friction"], self.pool_k)[:, 0]
        state0 = RigidState(Xs[:, 0], Xds[:, 0], Rs[:, 0], Omegas[:, 0])
        states, _, _ = rollout(self.robot, z, controls, state0=state0,
                               friction=friction, return_forces=False)
        # align to GT stamps (nearest predicted step)
        ids = jnp.argmin(jnp.abs(control_ts[:, None, :]
                                 - traj_ts[:, :, None]), axis=2)
        batch_ix = jnp.arange(Xs.shape[0])[:, None]
        X_pred = states.x[batch_ix, ids]
        R_pred = states.R[batch_ix, ids]
        loss_xyz = translation_difference(X_pred, Xs)
        loss_rot = rotation_difference(R_pred, Rs)
        metrics = {"hm_geom": loss_geom, "hm_terrain": loss_terrain,
                   "traj_xyz": loss_xyz, "traj_rot": loss_rot}
        return metrics, terrain, X_pred

    def run(self, variables, loader, csv_name: str = "losses.csv",
            save_figures: bool = False, d_max: float = 6.4):
        """Evaluate the loader; with ``save_figures`` also writes the per-batch
        3x4 diagnostic panel (reference eval.py:159-265) to out_dir."""
        from monoforce_tpu import vis
        path = os.path.join(self.out_dir, csv_name)
        rows = []
        for i, batch in enumerate(loader):
            batch = tuple(jnp.asarray(b) for b in batch)
            metrics, terrain, X_pred = self._step(variables, batch)
            m = {k: float(v) for k, v in metrics.items()}
            rows.append(m)
            with open(path, "a") as f:
                if i == 0 and f.tell() == 0:
                    f.write("batch," + ",".join(m.keys()) + "\n")
                f.write(f"{i}," + ",".join(f"{v:.6f}" for v in m.values()) + "\n")
            if save_figures:
                vis.save_eval_figure(
                    batch, terrain, X_pred, d_max=d_max,
                    path=os.path.join(self.out_dir, f"batch_{i:04d}.png"))
        return {k: float(np.mean([r[k] for r in rows])) for k in rows[0]} if rows else {}
