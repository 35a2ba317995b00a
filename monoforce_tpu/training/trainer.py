"""End-to-end trainer: terrain encoder + differentiable-physics loss.

Reference parity: monoforce/scripts/train.py —

- losses: geom/terrain heightmap MSE against the 2-channel (height, mask)
  labels (train.py:389,395) + trajectory physics loss through the rollout
  (train.py:399-406) with weights geom 1.0 / terrain 2.0 / phys 1.0
  (CLI defaults, train.py:34-36),
- the physics engine runs on 4x avg-pooled grids (0.1 m -> 0.4 m,
  train.py:96-99) with the GT controls and the gravity-aligned initial pose
  (train.py:231-246),
- Adam betas (0.8, 0.999), weight decay 1e-7 (train.py:374-375, L2-style,
  folded into the gradient like torch Adam), global-norm grad clip 1.0
  (train.py:151,167),
- NaN-loss guard -> emergency checkpoint + raise (train.py:161-163),
- best-train / best-val checkpointing (train.py:199-226) via orbax.

TPU-first: the whole train step (fwd + physics rollout + bwd + update) is a
single jitted SPMD program; batches shard over the ``('data',)`` mesh and
XLA inserts the gradient psum (see monoforce_tpu.parallel).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from monoforce_tpu.config import LSSConfig, PhysicsConfig
from monoforce_tpu.losses import hm_loss, physics_loss
from monoforce_tpu.models import LiftSplatShoot
from monoforce_tpu.physics.engine import (RigidState, RobotModel,
                                          auto_remat_segment, rollout)

__all__ = ["Trainer", "TrainState", "make_train_step", "avg_pool_grid"]


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def zero_non_finite():
    """Zero NaN AND ±inf gradient entries (strictly stronger than
    ``optax.zero_nans``, which passes inf through — an inf entry makes the
    global norm inf, so ``clip_by_global_norm`` scales by 1/inf = 0 and the
    inf entry itself becomes inf*0 = NaN DOWNSTREAM of the zero_nans stage,
    poisoning Adam's moments and then the params)."""
    return optax.stateless(
        lambda updates, params: jax.tree.map(
            lambda u: jnp.where(jnp.isfinite(u), u, jnp.zeros_like(u)),
            updates))


def make_optimizer(lr: float = 1e-3, weight_decay: float = 1e-7,
                   max_grad_norm: float = 1.0):
    """zero-non-finite -> clip -> L2 -> Adam(0.8, 0.999) (reference
    train.py:151,374-375; the zero_non_finite stage is our improvement over
    the reference's crash-on-NaN behavior — stray overflow in the
    stiff-contact BPTT becomes a skipped gradient contribution instead of a
    dead run)."""
    return optax.chain(
        zero_non_finite(),
        optax.clip_by_global_norm(max_grad_norm),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.8, b2=0.999),
        optax.scale(-lr),
    )


def avg_pool_grid(x, k: int):
    """(B, 1, H, W) average pool by factor k (train.py:96-99 bridge)."""
    B, C, H, W = x.shape
    return x.reshape(B, C, H // k, k, W // k, k).mean(axis=(3, 5))


def _physics_states(robot: RobotModel, terrain: Dict, pose0, controls, k: int):
    """Predict trajectories on the pooled predicted terrain (train.py:231-246).

    ``bptt_grad_clip`` bounds the per-step backward signal through the stiff
    contact dynamics (k=50 kN/m springs make long-horizon BPTT cotangents
    grow exponentially and overflow f32; forward values are untouched).
    """
    z = avg_pool_grid(terrain["terrain"], k)[:, 0]
    friction = avg_pool_grid(terrain["friction"], k)[:, 0]
    x0 = pose0[:, :3, 3]
    R0 = pose0[:, :3, :3]
    state0 = RigidState(x0, jnp.zeros_like(x0), R0, jnp.zeros_like(x0))
    # jax.checkpoint over scan segments (SURVEY §5): long-horizon BPTT stores
    # only segment-boundary states; gradients are identical to the plain scan.
    states, _, _ = rollout(robot, z, controls, state0=state0,
                           friction=friction, return_forces=False,
                           bptt_grad_clip=1e3,
                           remat_segment=auto_remat_segment(controls.shape[1]))
    return states


def make_train_step(model: LiftSplatShoot, robot: RobotModel, optimizer,
                    geom_weight: float = 1.0, terrain_weight: float = 2.0,
                    phys_weight: float = 1.0, pool_k: int = 4):
    """Build jitted train/eval steps closed over the model/optimizer."""

    def compute_losses(params, batch_stats, batch, train: bool, rng):
        (imgs, rots, trans, intrins, post_rots, post_trans,
         hm_geom, hm_terrain, control_ts, controls, pose0,
         traj_ts, Xs, Xds, Rs, Omegas) = batch
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            terrain, mutated = model.apply(
                variables, imgs, rots, trans, intrins, post_rots, post_trans,
                train=True, mutable=["batch_stats"], rngs={"dropout": rng})
            new_stats = mutated["batch_stats"]
        else:
            terrain = model.apply(variables, imgs, rots, trans, intrins,
                                  post_rots, post_trans)
            new_stats = batch_stats

        loss_geom = hm_loss(terrain["geom"], hm_geom[:, 0:1], hm_geom[:, 1:2])
        loss_terrain = hm_loss(terrain["terrain"], hm_terrain[:, 0:1],
                               hm_terrain[:, 1:2])
        if phys_weight > 0:
            states_pred = _physics_states(robot, terrain, pose0, controls, pool_k)
            loss_phys = physics_loss([states_pred.x], [Xs], control_ts, traj_ts)
        else:
            loss_phys = jnp.float32(0.0)
        total = (geom_weight * loss_geom + terrain_weight * loss_terrain
                 + phys_weight * loss_phys)
        aux = {"geom": loss_geom, "terrain": loss_terrain, "phys": loss_phys,
               "total": total}
        return total, (aux, new_stats)

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        (_, (aux, new_stats)), grads = jax.value_and_grad(
            compute_losses, has_aux=True)(
                state.params, state.batch_stats, batch, True, rng)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, aux

    @jax.jit
    def eval_step(state: TrainState, batch):
        _, (aux, _) = compute_losses(state.params, state.batch_stats, batch,
                                     False, jax.random.PRNGKey(0))
        return aux

    return train_step, eval_step


class Trainer:
    """Training loop with metrics logging, NaN guard and best checkpoints."""

    def __init__(self, dphys_cfg: Optional[PhysicsConfig] = None,
                 lss_cfg: Optional[LSSConfig] = None,
                 lr: float = 1e-4, geom_weight: float = 1.0,
                 terrain_weight: float = 2.0, phys_weight: float = 1.0,
                 log_dir: str = "runs/lss",
                 pretrained: Optional[str] = None):
        self.dphys_cfg = dphys_cfg or PhysicsConfig(robot="marv", grid_res=0.4)
        self.lss_cfg = lss_cfg or LSSConfig()
        self.model = LiftSplatShoot(self.lss_cfg.grid_conf,
                                    self.lss_cfg.data_aug_conf)
        self.robot = RobotModel.from_config(self.dphys_cfg)
        self.optimizer = make_optimizer(lr=lr)
        enc_res = self.lss_cfg.grid_conf["xbound"][2]
        pool_k = int(round(self.dphys_cfg.grid_res / enc_res))
        self.train_step, self.eval_step = make_train_step(
            self.model, self.robot, self.optimizer,
            geom_weight, terrain_weight, phys_weight, pool_k)
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.min_train_loss = np.inf
        self.min_val_loss = np.inf
        self.state: Optional[TrainState] = None
        self._pretrained = pretrained

    # ------------------------------------------------------------------ setup
    def init_state(self, example_batch, seed: int = 0) -> TrainState:
        (imgs, rots, trans, intrins, post_rots, post_trans, *_) = example_batch
        variables = self.model.init(jax.random.PRNGKey(seed), imgs, rots,
                                    trans, intrins, post_rots, post_trans)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self._pretrained:
            params, batch_stats = self.load_pretrained(
                self._pretrained, params, batch_stats)
        self.state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=self.optimizer,
            batch_stats=batch_stats)
        return self.state

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, name: str, full: bool = False):
        """Model checkpoint; with ``full`` also optimizer state + step for
        exact resume (the reference only saves state_dicts, train.py:204)."""
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(self.log_dir, name))
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": self.state.params,
                   "batch_stats": self.state.batch_stats}
        if full:
            payload["opt_state"] = self.state.opt_state
            payload["step"] = self.state.step
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def resume(self, name: str):
        """Restore a ``full`` checkpoint into the live train state."""
        import orbax.checkpoint as ocp
        assert self.state is not None, "call init_state first"
        path = os.path.abspath(os.path.join(self.log_dir, name))
        target = {"params": self.state.params,
                  "batch_stats": self.state.batch_stats,
                  "opt_state": self.state.opt_state,
                  "step": self.state.step}
        stored = ocp.StandardCheckpointer().restore(path, target=target)
        self.state = self.state.replace(
            params=stored["params"], batch_stats=stored["batch_stats"],
            opt_state=stored["opt_state"], step=stored["step"])
        return self.state

    def load_pretrained(self, path: str, params, batch_stats):
        """Partial restore: overlay stored entries onto fresh init (the
        reference's dict-update from_pretrained, lss.py:293-302).  Accepts
        orbax checkpoints or reference torch .pth state_dicts."""
        if path.endswith((".pth", ".pt")):
            import torch
            from monoforce_tpu.models.terrain_encoder.torch_port import (
                state_dict_to_variables)
            stored = state_dict_to_variables(
                torch.load(path, map_location="cpu"))
            return (_overlay(params, stored.get("params", {})),
                    _overlay(batch_stats, stored.get("batch_stats", {})))
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        stored = ckptr.restore(os.path.abspath(path))
        params = _overlay(params, stored.get("params", {}))
        batch_stats = _overlay(batch_stats, stored.get("batch_stats", {}))
        return params, batch_stats

    # ---------------------------------------------------------------- logging
    def log_metrics(self, split: str, metrics: Dict[str, float], step: int):
        rec = {"step": step, "split": split, "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        with open(os.path.join(self.log_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    # ------------------------------------------------------------------ loops
    def epoch(self, loader, train: bool = True, rng=None, step0: int = 0):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        sums, count, step = {}, 0, step0
        for batch in loader:
            batch = tuple(jnp.asarray(b) for b in batch)
            self._last_batch = batch
            if train:
                rng, sub = jax.random.split(rng)
                self.state, aux = self.train_step(self.state, batch, sub)
            else:
                aux = self.eval_step(self.state, batch)
            total = float(aux["total"])
            if np.isnan(total):
                # emergency checkpoint then fail loudly (train.py:161-163)
                self.save_checkpoint("nan_emergency")
                raise ValueError("Loss is NaN")
            for k, v in aux.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
            step += 1
            self.log_metrics("train" if train else "val",
                             {f"iter_loss_{k}": float(v) for k, v in aux.items()},
                             step)
        return ({k: v / max(count, 1) for k, v in sums.items()}, step)

    def log_prediction_figure(self, batch, tag: str):
        """Save the per-epoch prediction figure (reference logs one to
        TensorBoard each epoch, train.py:207-226): predicted/label heightmaps,
        friction, and the predicted-vs-GT trajectory on the current params."""
        from monoforce_tpu.losses import physics_loss  # noqa: F401 (parity ref)
        from monoforce_tpu import vis
        (imgs, rots, trans, intrins, post_rots, post_trans,
         hm_geom, hm_terrain, control_ts, controls, pose0,
         traj_ts, Xs, *_rest) = batch
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        terrain = self.model.apply(variables, imgs, rots, trans, intrins,
                                   post_rots, post_trans)
        pool_k = int(round(self.dphys_cfg.grid_res
                           / self.lss_cfg.grid_conf["xbound"][2]))
        states = _physics_states(self.robot, terrain, pose0, controls, pool_k)
        figs_dir = os.path.join(self.log_dir, "figures")
        os.makedirs(figs_dir, exist_ok=True)
        path = os.path.join(figs_dir, f"prediction_{tag}.png")
        return vis.save_prediction_figure(
            terrain, np.asarray(hm_geom)[0, 0:1], np.asarray(hm_terrain)[0, 0:1],
            np.asarray(states.x)[0], np.asarray(Xs)[0],
            d_max=float(self.dphys_cfg.d_max), path=path)

    def train(self, train_loader, val_loader, n_epochs: int = 1, seed: int = 0,
              save_figures: bool = True):
        rng = jax.random.PRNGKey(seed)
        tr_step = va_step = 0
        history = []
        for e in range(n_epochs):
            rng, sub = jax.random.split(rng)
            train_losses, tr_step = self.epoch(train_loader, True, sub, tr_step)
            self.log_metrics("train", {f"epoch_loss_{k}": v
                                       for k, v in train_losses.items()}, e)
            if train_losses["total"] < self.min_train_loss:
                self.min_train_loss = train_losses["total"]
                self.save_checkpoint("train_best")
            val_losses, va_step = self.epoch(val_loader, False, None, va_step)
            self.log_metrics("val", {f"epoch_loss_{k}": v
                                     for k, v in val_losses.items()}, e)
            if val_losses["total"] < self.min_val_loss:
                self.min_val_loss = val_losses["total"]
                self.save_checkpoint("val_best")
            if save_figures and getattr(self, "_last_batch", None) is not None:
                self.log_prediction_figure(self._last_batch, f"epoch_{e}")
            history.append({"train": train_losses, "val": val_losses})
        return history


def _overlay(base, stored):
    """Recursively overlay stored leaves onto a fresh pytree (partial load)."""
    if not isinstance(base, dict) or not isinstance(stored, dict):
        return stored if stored is not None else base
    out = dict(base)
    for k, v in stored.items():
        if k in out:
            out[k] = _overlay(out[k], v)
    return out
