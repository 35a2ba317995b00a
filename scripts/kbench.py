#!/usr/bin/env python
"""Micro-benchmark the fk_step kernel variants directly on the TPU.

Times N_CALLS kernel invocations inside one jitted scan (inputs perturbed
per call so nothing hoists), one small host sync at the end — the same
methodology as bench.py (docs/PERFORMANCE.md "Measurement methodology").

Usage: python scripts/kbench.py [pair3|pair] [--rb 128] [--calls 300]
"""

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RobotModel
from monoforce_tpu.ops import fk_step_pallas as K

B = 4096
N_CALLS = 2000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="pair3",
                    choices=["pair3", "pair"])
    ap.add_argument("--rb", type=int, default=0, help="override block rows")
    ap.add_argument("--calls", type=int, default=N_CALLS)
    args = ap.parse_args()

    if args.mode == "pair3":
        cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=0.1)
    else:
        cfg = PhysicsConfig.for_planner("tradr")
    robot = RobotModel.from_config(cfg)
    P = robot.points.shape[0]
    n_k = robot.n_tracks
    cst = K.pack_consts(robot)
    if args.mode == "pair3":
        pts = K.pack_points_pair3(robot)
    else:
        pts = K.pack_points_pair(robot)

    key = jax.random.PRNGKey(0)
    BP = B // 2
    patch = jax.random.normal(key, (BP, 512), jnp.float32) * 0.1
    patch_z = patch[:, :256]                      # zu modes: z plane alone
    patch_q = jnp.concatenate([patch, patch], axis=1)   # muq: 1024 wide
    state18 = jnp.tile(jnp.asarray(
        [0, 0, 0.2, 0.5, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0.1],
        jnp.float32), (B, 1))
    tv = jnp.tile(jnp.asarray([0.5, 0.4] + [0.0] * 6, jnp.float32), (B, 1))
    sxy = jnp.tile(jnp.asarray([50.0, 50.0], jnp.float32), (B, 1))

    def timed(name, fn, p_in=None):
        p_in = patch if p_in is None else p_in

        @jax.jit
        def many(p, s):
            def body(carry, i):
                # chain the carry through the state operand so calls cannot
                # be hoisted or reordered, without re-materializing patch
                acc, sc = carry
                out = fn(p, sc)
                return (acc + out.sum(), sc + out[:1, :1] * 1e-9), ()
            return lax.scan(body, (0.0, s), jnp.arange(args.calls))[0][0]

        np.asarray(many(p_in, state18))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(p_in, state18))
            ts.append(time.perf_counter() - t0)
        per = min(ts) * 1e6 / args.calls
        print(f"{name:28s} {per:8.1f} us/call  "
              f"({per * 100 / 1000:.2f} ms/100 steps)")

    if args.mode == "pair3":
        def sel(p, s):
            return K.fk_step_pair3(cst, p, s.reshape(-1, 36),
                                   tv.reshape(-1, 16), sxy.reshape(-1, 4),
                                   pts, n_k=n_k)

        def zu(p, s):
            return K.fk_step_pair3_zu(cst, p, s.reshape(-1, 36),
                                      tv.reshape(-1, 16), sxy.reshape(-1, 4),
                                      pts, n_k=n_k)

        def muq(p, s):
            return K.fk_step_pair3_muq(cst, p, s.reshape(-1, 36),
                                       tv.reshape(-1, 16), sxy.reshape(-1, 4),
                                       pts, n_k=n_k)

        timed("pair3 select", sel)
        timed("pair3 zu", zu)
        timed("pair3 muq", muq, p_in=patch_q)
    else:
        def sel(p, s):
            return K.fk_step_pair(cst, p, s.reshape(-1, 36),
                                  tv.reshape(-1, 16), sxy.reshape(-1, 4),
                                  pts, n_k=n_k)

        timed("pair select", sel)

        def zu(p, s):
            if args.rb:
                # direct pallas entry with an overridden row block — probes
                # block sizes _block_rows never picks (e.g. 1024/2048, viable
                # for the half-width (BP, 256) zu patch)
                return K._fk_pair_pallas(cst, p, s.reshape(-1, 36),
                                         tv.reshape(-1, 16),
                                         sxy.reshape(-1, 4), pts, n_k,
                                         args.rb, zmode=True)
            return K.fk_step_pair_zu(cst, p, s.reshape(-1, 36),
                                     tv.reshape(-1, 16), sxy.reshape(-1, 4),
                                     pts, n_k=n_k)

        timed(f"pair zu (rb={args.rb or 'auto'})", zu, p_in=patch_z)


if __name__ == "__main__":
    main()
