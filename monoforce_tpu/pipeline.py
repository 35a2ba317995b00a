"""End-to-end MonoForce pipeline: images -> terrain -> trajectories -> path.

Reference parity: monoforce/scripts/run.py (offline CLI) and the fused online
node (monoforce_ros/nodes/monoforce_node.py): run the terrain encoder on a
multi-camera frame, shoot ``n_sim_trajs`` sampled control sequences through
the differentiable physics on the predicted elevation+friction grids, cost
each path (force variance), and return the lowest-cost one.

The whole predict step (encoder forward + shooting rollout + costs) is a
single jitted program — the ROS topic boundaries of the reference become
function composition on device.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from monoforce_tpu.config import LSSConfig, PhysicsConfig
from monoforce_tpu.models import LiftSplatShoot
from monoforce_tpu.physics.controls import shooting_controls
from monoforce_tpu.physics.engine import RigidState, RobotModel
from monoforce_tpu.planner.shooting import PlanResult, _plan

__all__ = ["MonoForce"]


class MonoForce:
    """images + calib -> BEV terrain -> sampled rollouts -> best path."""

    def __init__(self, dphys_cfg: Optional[PhysicsConfig] = None,
                 lss_cfg: Optional[LSSConfig] = None,
                 params=None, cost: str = "force_variance",
                 half: bool = False):
        """``half=True`` serves the camera trunk in bf16 (2.0x encoder
        latency on v5e; terrain RMSE ~5 mm on O(0.3 m) outputs — measured
        and gated, see models.terrain_encoder.lss.half_inference_variables).
        Checkpoints stay f32; the cast happens inside the jitted program."""
        self.dphys_cfg = dphys_cfg or PhysicsConfig(robot="tradr")
        self.lss_cfg = lss_cfg or LSSConfig()
        self.model = LiftSplatShoot(self.lss_cfg.grid_conf,
                                    self.lss_cfg.data_aug_conf)
        self.robot = RobotModel.from_config(self.dphys_cfg)
        self.params = params
        self.cost = cost
        self.half = half

    def init_params(self, example_inputs, seed: int = 0):
        self.params = self.model.init(jax.random.PRNGKey(seed), *example_inputs)
        return self.params

    def load_torch_checkpoint(self, path: str):
        """Load a reference PyTorch LSS checkpoint (.pth state_dict) — the
        weights the reference distributes (docs/INSTALL.md) — via
        models.terrain_encoder.torch_port."""
        import torch
        from monoforce_tpu.models.terrain_encoder.torch_port import (
            state_dict_to_variables)
        sd = torch.load(path, map_location="cpu")
        self.params = state_dict_to_variables(sd)
        return self.params

    @functools.partial(jax.jit, static_argnames=("self",))
    def _predict(self, params, imgs, rots, trans, intrins, post_rots,
                 post_trans, controls, state0):
        if self.half:
            from monoforce_tpu.models.terrain_encoder.lss import (
                half_inference_variables)
            params = half_inference_variables(params)
            imgs = imgs.astype(jnp.bfloat16)
        terrain = self.model.apply(params, imgs, rots, trans, intrins,
                                   post_rots, post_trans)
        z = terrain["terrain"][0, 0]
        friction = terrain["friction"][0, 0]
        plan = _plan.__wrapped__(self.robot, z, friction, controls, state0,
                                 self.cost)
        return terrain, plan

    def run(self, imgs, rots, trans, intrins, post_rots, post_trans,
            key=None, state0: Optional[RigidState] = None,
            controls=None) -> Tuple[Dict, PlanResult]:
        """Single-frame inference (batch dim 1 on the images).

        Returns (terrain maps dict, PlanResult with B=n_sim_trajs paths).
        """
        assert self.params is not None, "call init_params or load weights first"
        if controls is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            controls, _ = shooting_controls(
                key, self.dphys_cfg.n_sim_trajs, self.dphys_cfg.vel_max,
                self.dphys_cfg.omega_max, self.dphys_cfg.traj_sim_time,
                self.dphys_cfg.dt)
        if state0 is not None:
            # a single robot state (unbatched leaves) is replicated across
            # the shooting batch, like the online node's repeated pose
            B = controls.shape[0]
            state0 = RigidState(*[jnp.broadcast_to(jnp.asarray(a),
                                                   (B,) + jnp.shape(a))
                                  for a in state0])
        return self._predict(self.params, imgs, rots, trans, intrins,
                             post_rots, post_trans, controls, state0)
