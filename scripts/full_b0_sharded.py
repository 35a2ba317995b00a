#!/usr/bin/env python
"""One-off artifact: the FULL EfficientNet-B0 train step compiled + executed
under data-parallel sharding (VERDICT r4 weak #6).

The driver-facing ``__graft_entry__.dryrun_multichip`` and the in-suite DP
gate (tests/test_parallel.py) both use a reduced 2-stage camera trunk,
because compiling all 16 MBConv blocks fwd+bwd is minutes of XLA CPU time on
this single-core box and would blow the driver budget.  This script closes
the "reduced trunk only" caveat once: it jits the FULL B0 train step
(default ``trunk_stages`` — the whole reference table, lss.py:49-99 /
efficientnet.py B0_STAGES) over an 8-device virtual CPU mesh, runs ONE step,
asserts the loss is finite and the params move, and logs phase timings.

Run (fresh process; heavy — do not overlap the test suite on this box):

    JAX_PLATFORMS=cpu python scripts/full_b0_sharded.py 2>&1 \
        | tee docs/full_b0_sharded.log

Committed artifact: docs/full_b0_sharded.log
"""

import os as _os
import sys as _sys
import time

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(_os.path.realpath(__file__))))
_sys.path.insert(0, _REPO)

import numpy as np

N_DEVICES = 8
_T0 = time.time()


def _log(msg: str) -> None:
    print(f"[full_b0 +{time.time() - _T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", N_DEVICES)
    assert len(jax.devices()) == N_DEVICES
    _log(f"backend up: {N_DEVICES} {jax.default_backend()} devices")

    import jax.numpy as jnp

    from __graft_entry__ import _fake_inputs, _tiny_cfgs
    from monoforce_tpu.models import LiftSplatShoot
    from monoforce_tpu.parallel import make_mesh, replicated, shard_batch
    from monoforce_tpu.physics.engine import RobotModel
    from monoforce_tpu.training.trainer import (TrainState, make_optimizer,
                                                make_train_step)

    mesh = make_mesh(N_DEVICES)
    lss_cfg, dphys_cfg = _tiny_cfgs()
    # FULL B0: default trunk_stages (16 MBConv blocks), default Up fusion
    # channels, default /16 deepest reduction — the production encoder
    # configuration, only the image/grid geometry is kept tiny (sharding
    # evidence is about the program structure, not the pixel count).
    model = LiftSplatShoot(lss_cfg.grid_conf, lss_cfg.data_aug_conf)
    robot = RobotModel.from_config(dphys_cfg)

    B, N_cams, h, w = 2 * N_DEVICES, 2, 32, 64
    rng = np.random.default_rng(0)
    img_inputs = _fake_inputs(rng, B, N_cams, h, w)
    G = 32
    n_ctrl = dphys_cfg.n_sim_steps
    n_traj = int(np.ceil(dphys_cfg.traj_sim_time / 0.1))
    batch = img_inputs + (
        jnp.asarray(rng.normal(size=(B, 2, G, G)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 2, G, G)).astype(np.float32)),
        jnp.tile(jnp.linspace(0, dphys_cfg.traj_sim_time, n_ctrl)[None], (B, 1)),
        jnp.asarray(rng.uniform(-1, 1, (B, n_ctrl, 2)).astype(np.float32)),
        jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
        jnp.tile(jnp.linspace(0, dphys_cfg.traj_sim_time, n_traj)[None], (B, 1)),
        jnp.asarray(rng.normal(size=(B, n_traj, 3)).astype(np.float32)),
        jnp.zeros((B, n_traj, 3)),
        jnp.broadcast_to(jnp.eye(3), (B, n_traj, 3, 3)),
        jnp.zeros((B, n_traj, 3)),
    )
    _log("batch built")

    variables = model.init(jax.random.PRNGKey(0), *(a[:1] for a in img_inputs))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    _log(f"model.init done: {n_params:,} params (full B0 trunk)")

    # the PRODUCTION optimizer chain (trainer.py make_optimizer:
    # zero_non_finite -> clip 1.0 -> wd -> Adam(0.8, 0.999)).  Plain
    # optax.adam is NOT equivalent here: on this untrained-random-init +
    # random-terrain synthetic batch the 500-step stiff-contact BPTT emits a
    # NaN gradient cotangent, which plain Adam writes straight into the
    # params (observed: finite step-1 loss, NaN step-2 forward);
    # zero_non_finite is the production guard for exactly that.
    tx = make_optimizer(1e-4)
    state0 = TrainState.create(apply_fn=model.apply,
                               params=variables["params"], tx=tx,
                               batch_stats=variables.get("batch_stats", {}))
    train_step, _ = make_train_step(model, robot, tx, pool_k=4)
    batch_dp = shard_batch(batch, mesh)
    state_dp = jax.device_put(state0, replicated(mesh))
    _log("compiling the FULL-B0 sharded train step (fwd+bwd, 16 MBConv "
         "blocks, heightmap+physics losses, adam) ...")
    t0 = time.time()
    state1, aux = train_step(state_dp, batch_dp, jax.random.PRNGKey(1))
    total = float(aux["total"])
    _log(f"compile+first step done in {time.time() - t0:.1f}s: "
         f"loss={total:.6f} "
         f"({', '.join(f'{k}={float(v):.4f}' for k, v in sorted(aux.items()))})")
    assert np.isfinite(total), aux
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(state0.params),
                                jax.tree.leaves(state1.params)))
    assert moved, "train step left every parameter unchanged"
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree.leaves(state1.params)), \
        "step-1 update wrote non-finite params"
    _log("step-1 params: all finite")
    t0 = time.time()
    state2, aux2 = train_step(state1, batch_dp, jax.random.PRNGKey(2))
    jax.block_until_ready(aux2["total"])
    _log(f"second (cached) step: {time.time() - t0:.2f}s, "
         f"loss={float(aux2['total']):.6f}")
    assert np.isfinite(float(aux2["total"]))
    _log("FULL-B0 sharded train step: compiled, executed, loss finite, "
         "params moved — all assertions passed")


if __name__ == "__main__":
    main()
