"""Multi-chip shooting: shard the rollout batch across the device mesh.

The rollout batch (sampled control sequences) is embarrassingly parallel —
each trajectory only reads the shared terrain.  ``sharded_shoot`` uses
``shard_map`` over the ``('data',)`` mesh: the terrain replicates to every
chip, the controls/state shard, each chip rolls its slice with the serving
planner path, and only the final (B,) costs ride the ICI back (an all_gather of a
few KB).  This is the TPU-native scaling story that replaces the reference's
nonexistent distributed backend (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from monoforce_tpu.physics.engine import RigidState, RobotModel
from monoforce_tpu.physics.fast import planner_rollout
from monoforce_tpu.planner.shooting import (
    force_variance_cost, inclination_cost,
)

__all__ = ["sharded_shoot"]


def sharded_shoot(mesh: Mesh, robot: RobotModel, z_grid, controls,
                  state0: Optional[RigidState] = None, friction=None,
                  cost: str = "force_variance"):
    """Shooting batch sharded over ``mesh``'s 'data' axis.

    Args:
      mesh: a 1-D ``('data',)`` mesh (see parallel.make_mesh).
      z_grid/friction: (H, W) shared terrain (replicated to all chips).
      controls: (B, N, 2) with B divisible by the mesh size.
      state0: optional (B, ...) initial states (sharded alongside).

    Returns (xs (B, N, 3), costs (B,)), both sharded over 'data'.
    """
    if friction is None:
        friction = jnp.ones_like(z_grid)

    def local_shoot(z, fr, ctr, st):
        # serving path per shard (forward-only shooting); pair mode engages
        # when the per-shard batch and contact preset allow it
        states, stats = planner_rollout.__wrapped__(
            robot, z, ctr, state0=st, friction=fr)
        if cost == "force_variance":
            costs = force_variance_cost(stats.spring_std)
        else:
            costs = inclination_cost(stats.abs_roll, stats.abs_pitch)
        return states.x, costs

    in_specs = (P(), P(), P("data"),
                None if state0 is None else RigidState(
                    P("data"), P("data"), P("data"), P("data")))
    if state0 is None:
        fn = shard_map(lambda z, fr, c: local_shoot(z, fr, c, None),
                       mesh=mesh, in_specs=in_specs[:3],
                       out_specs=(P("data"), P("data")),
                       check_vma=False)
        return jax.jit(fn)(z_grid, friction, controls)
    fn = shard_map(local_shoot, mesh=mesh, in_specs=in_specs,
                   out_specs=(P("data"), P("data")), check_vma=False)
    return jax.jit(fn)(z_grid, friction, controls, state0)
