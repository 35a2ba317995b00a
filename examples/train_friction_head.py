#!/usr/bin/env python
"""Head-only fine-tuning through the physics (the reference's
train_friction_head_with_pretrained_terrain_encoder.ipynb pattern):
freeze the trunk, train ONLY the friction head so that rollouts on the
predicted friction match the observed trajectories.

Uses a synthetic scene (no dataset needed): a ground-truth world with low
friction on one side generates demonstration trajectories; the friction head
must explain why the robot slips there.

Run: python examples/train_friction_head.py
"""

import os as _os
import sys as _sys

# make the repo root importable when run as `python scripts/x.py` (a runtime
# insert, NOT PYTHONPATH: pre-setting PYTHONPATH breaks the TPU plugin
# registration in this environment)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np
import optax

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.losses import physics_loss
from monoforce_tpu.physics.engine import RobotModel, rollout


def main():
    cfg = PhysicsConfig(robot="tradr", grid_res=0.4, traj_sim_time=2.0)
    robot = RobotModel.from_config(cfg)
    H, W = cfg.grid_shape
    n = cfg.n_sim_steps

    # ground truth: flat terrain, slippery for y > 0
    gx, gy = cfg.grid_coords()
    z = jnp.zeros((H, W))
    friction_true = jnp.asarray(0.2 + 0.8 * (gy < 0), jnp.float32)

    B = 8
    v = jnp.linspace(0.4, 1.0, B)
    w = jnp.linspace(-0.6, 0.6, B)
    controls = jnp.stack([jnp.tile(v[:, None], (1, n)),
                          jnp.tile(w[:, None], (1, n))], axis=-1)
    zb = jnp.broadcast_to(z, (B, H, W))
    states_gt, _, _ = rollout(robot, zb, controls,
                              friction=jnp.broadcast_to(friction_true,
                                                        (B, H, W)),
                              return_forces=False)
    ts = jnp.tile(jnp.linspace(0, cfg.traj_sim_time, n)[None], (B, 1))

    # "friction head": a tiny conv over fixed terrain features — stands in
    # for the frozen-encoder + trainable-head setup of the notebook
    import flax.linen as nn

    class FrictionHead(nn.Module):
        @nn.compact
        def __call__(self, feats):
            h = nn.Conv(8, (3, 3))(feats)
            h = nn.relu(h)
            return nn.relu(nn.Conv(1, (1, 1))(h))[..., 0]

    feats = jnp.stack([jnp.asarray(gx) / cfg.d_max,
                       jnp.asarray(gy) / cfg.d_max], axis=-1)[None]
    head = FrictionHead()
    params = head.init(jax.random.PRNGKey(0), feats)

    def loss_fn(p):
        fr = head.apply(p, feats)[0]
        states, _, _ = rollout(robot, zb, controls,
                               friction=jnp.broadcast_to(fr, (B, H, W)),
                               return_forces=False, bptt_grad_clip=1e3)
        return physics_loss([states.x], [states_gt.x], ts, ts)

    opt = optax.adam(3e-2)
    opt_state = opt.init(params)
    step = jax.jit(lambda p, s: _step(p, s))

    def _step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, l

    for i in range(30):
        params, opt_state, l = step(params, opt_state)
        if i % 5 == 0:
            print(f"iter {i:3d}  physics loss {float(l):.5f}")

    fr = np.asarray(head.apply(params, feats)[0])
    low = fr[:, : W // 2].mean()   # y < 0 half (higher true friction)
    high = fr[:, W // 2:].mean()   # y > 0 half (slippery)
    print(f"learned friction means: y<0 {low:.2f}  y>0 {high:.2f} "
          f"(truth 1.0 / 0.2)")


if __name__ == "__main__":
    main()
