#!/usr/bin/env python
"""Perf regression guard: measured kernel/e2e latencies vs committed baselines.

The CPU test suite cannot see TPU latency regressions — a silent demotion is
caught by tests/test_fast.py::test_planner_kernel_mode_pins_presets, but a
slow-down INSIDE a kernel (a Mosaic regression, an accidental f32 widening, a
gather ladder growing a pass) passes every accuracy gate.  This script is the
loud check: it re-measures the headline kernels (kbench methodology —
N calls chained inside one jitted scan, docs/PERFORMANCE.md "Measurement
methodology") and compares each against `tests/perf_baselines.json`,
failing (exit 1) on >`tol_pct` regression.

Run on the real TPU after any kernel-adjacent change:

    python scripts/perf_guard.py            # kernel µbenches (~1 min)
    python scripts/perf_guard.py --e2e      # + the three bench.py workloads

Re-baseline intentionally with `--write` (prints the new file; commit it
together with the change that justified it).
"""

import argparse
import json
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

BASELINES = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), "tests", "perf_baselines.json")
B = 4096
N_CALLS = 2000   # 300-call runs lie by ±30% (docs/PERFORMANCE.md)


def _timed_kernel(fn, patch, state18, calls):
    """µs/call: ``calls`` invocations chained inside one jitted scan."""
    @jax.jit
    def many(p, s):
        def body(carry, i):
            acc, sc = carry
            out = fn(p, sc)
            return (acc + out.sum(), sc + out[:1, :1] * 1e-9), ()
        return lax.scan(body, (0.0, s), jnp.arange(calls))[0][0]

    np.asarray(many(patch, state18))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(many(patch, state18))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e6 / calls


def measure_kernels(calls):
    """The four serving-kernel µbenches guarded against regression."""
    key = jax.random.PRNGKey(0)
    BP = B // 2
    patch = jax.random.normal(key, (BP, 512), jnp.float32) * 0.1
    patch_z = patch[:, :256]
    state18 = jnp.tile(jnp.asarray(
        [0, 0, 0.2, 0.5, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0.1],
        jnp.float32), (B, 1))
    tv = jnp.tile(jnp.asarray([0.5, 0.4] + [0.0] * 6, jnp.float32), (B, 1))
    sxy = jnp.tile(jnp.asarray([50.0, 50.0], jnp.float32), (B, 1))

    out = {}

    rb_pair = RobotModel.from_config(PhysicsConfig.for_planner("tradr"))
    cst, pts = K.pack_consts(rb_pair), K.pack_points_pair(rb_pair)
    n_k = rb_pair.n_tracks

    out["kernel_pair_zu_us"] = _timed_kernel(
        lambda p, s: K.fk_step_pair_zu(cst, p, s.reshape(-1, 36),
                                       tv.reshape(-1, 16), sxy.reshape(-1, 4),
                                       pts, n_k=n_k),
        patch_z, state18, calls)
    out["kernel_pair_us"] = _timed_kernel(
        lambda p, s: K.fk_step_pair(cst, p, s.reshape(-1, 36),
                                    tv.reshape(-1, 16), sxy.reshape(-1, 4),
                                    pts, n_k=n_k),
        patch, state18, calls)

    rb3 = RobotModel.from_config(PhysicsConfig(robot="tradr",
                                               mesh_voxel_size=0.1))
    cst3, pts3 = K.pack_consts(rb3), K.pack_points_pair3(rb3)
    n_k3 = rb3.n_tracks

    out["kernel_pair3_zu_us"] = _timed_kernel(
        lambda p, s: K.fk_step_pair3_zu(cst3, p, s.reshape(-1, 36),
                                        tv.reshape(-1, 16),
                                        sxy.reshape(-1, 4), pts3, n_k=n_k3),
        patch, state18, calls)
    out["kernel_pair3_us"] = _timed_kernel(
        lambda p, s: K.fk_step_pair3(cst3, p, s.reshape(-1, 36),
                                     tv.reshape(-1, 16), sxy.reshape(-1, 4),
                                     pts3, n_k=n_k3),
        patch, state18, calls)
    patch_q = jnp.concatenate([patch, patch], axis=1)   # muq: 1024 wide
    out["kernel_pair3_muq_us"] = _timed_kernel(
        lambda p, s: K.fk_step_pair3_muq(cst3, p, s.reshape(-1, 36),
                                         tv.reshape(-1, 16),
                                         sxy.reshape(-1, 4), pts3, n_k=n_k3),
        patch_q, state18, calls)
    return out


def measure_e2e(reps=100):
    """The three driver-visible bench.py lines (ms/batch)."""
    import bench
    out = {}
    out["e2e_reference_resolution_zu_ms"] = bench._measure(
        PhysicsConfig(robot="tradr", mesh_voxel_size=0.1))
    out["e2e_reference_resolution_mu_ms"] = bench._measure(
        PhysicsConfig(robot="tradr", mesh_voxel_size=0.1), with_friction=True)
    out["e2e_headline_pair_ms"] = bench._measure(
        PhysicsConfig.for_planner("tradr"))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e2e", action="store_true",
                    help="also guard the three bench.py workloads")
    ap.add_argument("--calls", type=int, default=N_CALLS)
    ap.add_argument("--write", action="store_true",
                    help="re-baseline: write measured values to the file")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", (
        "perf_guard measures real-TPU latency; run it on the chip "
        f"(got backend={jax.default_backend()})")

    measured = measure_kernels(args.calls)
    if args.e2e:
        measured.update(measure_e2e())

    with open(BASELINES) as f:
        spec = json.load(f)
    tol_pct = spec["tol_pct"]
    base = spec["baselines"]

    if args.write:
        spec["baselines"] = {k: round(v, 2) for k, v in
                             {**base, **measured}.items()}
        with open(BASELINES, "w") as f:
            json.dump(spec, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"re-baselined {len(measured)} entries -> {BASELINES}")
        return 0

    failed = []
    for name, val in sorted(measured.items()):
        if name not in base:
            print(f"{name:36s} {val:9.2f}   (no baseline — run --write)")
            continue
        ref = base[name]
        delta = 100.0 * (val - ref) / ref
        flag = "REGRESSION" if delta > tol_pct else "ok"
        print(f"{name:36s} {val:9.2f} vs {ref:9.2f}  {delta:+6.1f}%  {flag}")
        if delta > tol_pct:
            failed.append(name)
    if failed:
        print(f"\nFAIL: {len(failed)} metric(s) regressed >{tol_pct}%: "
              f"{', '.join(failed)}")
        return 1
    print(f"\nall {len(measured)} metrics within {tol_pct}% of baseline")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
