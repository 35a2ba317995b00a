"""Inverse physics: fit terrain elevation + friction to observed trajectories
by gradient descent through the rollout.

Reference parity: monoforce/scripts/fit_terrain.py:12-96 — Adam with separate
learning rates for the heightmap (0.02) and friction (0.01), trajectory MSE
loss (losses.physics_loss), optional total-variation regularization.  This is
the purest gradient-through-simulator use case (benchmark config #3).

TPU-first: the whole optimization step (rollout + loss + grads + Adam update)
is one jitted program; ``jax.checkpoint`` over the scan can be added for very
long horizons (the reference never materializes BPTT memory concerns at its
B<=64 scale).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from monoforce_tpu.losses import physics_loss, total_variation
from monoforce_tpu.physics.engine import (RigidState, RobotModel,
                                          auto_remat_segment, rollout)

__all__ = ["fit_terrain", "terrain_fit_step", "terrain_fit_chunk",
           "TerrainParams"]


class TerrainParams(NamedTuple):
    z_grid: jax.Array    # (H, W) shared elevation estimate
    friction: jax.Array  # (H, W) shared friction estimate


@functools.lru_cache(maxsize=None)
def make_optimizer(lr_z: float = 0.02, lr_friction: float = 0.01):
    """Per-parameter-group Adam like the reference param groups
    (fit_terrain.py:46-47).  Memoized so repeated fits reuse one optimizer
    object — it is a static jit argument of the fit steps, and a fresh
    object per call would force a full recompile of the chunked program."""
    return optax.multi_transform(
        {"z": optax.adam(lr_z), "f": optax.adam(lr_friction)},
        TerrainParams(z_grid="z", friction="f"),
    )


def _loss_fn(params: TerrainParams, robot: RobotModel, controls, states_gt,
             pred_ts, gt_ts, state0, tv_weight: float,
             remat_segment=None, use_fast: bool = True):
    B = controls.shape[0]
    zb = jnp.broadcast_to(params.z_grid, (B,) + params.z_grid.shape)
    fb = jnp.broadcast_to(params.friction, (B,) + params.friction.shape)
    if use_fast and not robot.has_flippers and remat_segment is None:
        # the production fast path is differentiable (custom VJPs route the
        # backward through the XLA reference implementations) and parity-
        # gated vs the exact engine; ~2x faster fits at bench scales.  It has
        # no remat support, so long horizons (remat_segment set) take the
        # exact engine below and keep their O(N/K + K) BPTT memory bound.
        from monoforce_tpu.physics.fast import fast_rollout
        states, _ = fast_rollout.__wrapped__(robot, zb, controls,
                                             state0=state0, friction=fb,
                                             with_stats=False)
    else:
        states, _, _ = rollout(robot, zb, controls, state0=state0,
                               friction=fb, return_forces=False,
                               remat_segment=remat_segment)
    loss = physics_loss([states.x], [states_gt[0]], pred_ts, gt_ts)
    if tv_weight > 0:
        loss = loss + tv_weight * total_variation(params.z_grid)
    return loss


@functools.partial(jax.jit, static_argnames=("optimizer", "tv_weight",
                                              "remat_segment"))
def terrain_fit_step(params: TerrainParams, opt_state, robot: RobotModel,
                     controls, states_gt, pred_ts, gt_ts,
                     state0: Optional[RigidState], optimizer,
                     tv_weight: float = 0.0, remat_segment=None):
    """One jitted optimization step; returns (params, opt_state, loss)."""
    loss, grads = jax.value_and_grad(_loss_fn)(
        params, robot, controls, states_gt, pred_ts, gt_ts, state0, tv_weight,
        remat_segment)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnames=("optimizer", "tv_weight",
                                              "remat_segment", "length"))
def terrain_fit_chunk(params: TerrainParams, opt_state, robot: RobotModel,
                      controls, states_gt, pred_ts, gt_ts,
                      state0: Optional[RigidState], optimizer,
                      tv_weight: float, remat_segment, length: int):
    """``length`` whole optimization steps in ONE device program (a
    ``lax.scan`` over terrain_fit_step's body) — a 100-iteration fit costs a
    handful of host round trips instead of 100 (the serving environment has
    a ~30 ms dispatch floor).  Module-level so the jit cache is shared
    across fit_terrain calls."""
    def body(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(_loss_fn)(
            params, robot, controls, states_gt, pred_ts, gt_ts, state0,
            tv_weight, remat_segment)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss
    (params, opt_state), chunk_losses = jax.lax.scan(
        body, (params, opt_state), None, length=length)
    return params, opt_state, chunk_losses


def fit_terrain(cfg, controls, states_gt, pred_ts, gt_ts, state0=None,
                n_iters: int = 100, lr_z: float = 0.02,
                lr_friction: float = 0.01, friction_init: float = 0.5,
                tv_weight: float = 0.0, verbose: bool = False,
                device_chunk: int = 25):
    """Optimize (z_grid, friction) to explain ground-truth trajectories.

    Args:
      cfg: PhysicsConfig.
      controls: (B, N, 2) control sequences driven during the demonstrations.
      states_gt: sequence whose first element is GT positions (B, T, 3).
      pred_ts / gt_ts: (B, N) / (B, T) timestamps for alignment.
      state0: optional initial RigidState with (B, ...) leaves.
      device_chunk: iterations run per device dispatch — a ``lax.scan`` over
        whole optimization steps, so a 100-iteration fit costs 4 host round
        trips instead of 100 (the serving environment has a ~30 ms dispatch
        floor; see docs/PERFORMANCE.md).  With ``verbose`` the loop runs one
        step per dispatch to stream losses.

    Returns (TerrainParams, losses list).
    """
    robot = RobotModel.from_config(cfg)
    params = TerrainParams(
        z_grid=jnp.zeros(cfg.grid_shape, jnp.float32),
        friction=jnp.full(cfg.grid_shape, friction_init, jnp.float32),
    )
    optimizer = make_optimizer(lr_z, lr_friction)
    opt_state = optimizer.init(params)
    # O(N) BPTT memory is trivial at fit-terrain scales; only remat
    # genuinely long horizons (the trainer's T=500 path always does)
    remat = auto_remat_segment(controls.shape[1], threshold=256)
    states_gt = [jnp.asarray(s) for s in states_gt]
    losses = []
    if verbose or device_chunk <= 1:
        for it in range(n_iters):
            params, opt_state, loss = terrain_fit_step(
                params, opt_state, robot, controls, states_gt, pred_ts, gt_ts,
                state0, optimizer, tv_weight, remat_segment=remat)
            losses.append(float(loss))
            if verbose and it % 10 == 0:
                print(f"iter {it}: loss {losses[-1]:.6f}")
        return params, losses

    done = 0
    while done < n_iters:
        length = min(device_chunk, n_iters - done)
        params, opt_state, chunk_losses = terrain_fit_chunk(
            params, opt_state, robot, controls, states_gt, pred_ts, gt_ts,
            state0, optimizer, tv_weight, remat, length)
        losses.extend(float(v) for v in chunk_losses)
        done += length
    return params, losses
