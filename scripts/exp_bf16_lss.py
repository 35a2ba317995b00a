#!/usr/bin/env python
"""Experiment: half-precision LSS inference on TPU.

Measures sustained latency and output error of the terrain encoder under
three compute policies:

  f32      — current default (params f32, activations f32)
  bf16     — params AND activations cast to bf16 (BatchNorm stats too)
  bf16io   — params bf16, inputs bf16, but the BEV heads' outputs read in f32

On TPU the MXU already runs f32 convs via bf16 passes, so the hypothesis is
that bf16 wins come from HALVED activation/param HBM traffic (depthwise convs,
swish, BN are bandwidth-bound at 256x416), not arithmetic rate.  Outputs are
compared against the f32 path on the terrain/geom/friction heads (meters).

Run:  timeout 280 python scripts/exp_bf16_lss.py 2>/dev/null
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sustained_ms(fn, *args, reps):
    f = jax.jit(fn)
    np.asarray(f(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        times.append(time.perf_counter() - t0)
    return float(np.min(times) * 1e3 / reps)


def main():
    from bench_all import _lss_setup

    reps = 20
    model, variables, inputs = _lss_setup(B=1)

    # A freshly-initialized model outputs ~1e-9 (zero-init residual BN +
    # near-zero heads), which would make any quantization-error comparison
    # meaningless.  Perturb every f32 leaf to realistic magnitudes so the
    # heads produce O(0.1-1) terrain values.
    key = jax.random.PRNGKey(42)
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(key, len(leaves))
    leaves = [
        a + 0.05 * jax.random.normal(k, a.shape, a.dtype)
        if a.dtype == jnp.float32 else a
        for a, k in zip(leaves, keys)
    ]
    variables = jax.tree.unflatten(treedef, leaves)

    def run_with(vars_c, cast):
        def run(imgs, *rest):
            def body(acc, i):
                out = model.apply(vars_c, cast(imgs + i * 1e-4), *rest)
                return acc + jnp.mean(out["terrain"].astype(jnp.float32)), ()
            return lax.scan(body, 0.0, jnp.arange(float(reps)))[0]
        return run

    def outputs_with(vars_c, cast):
        @jax.jit
        def f(imgs, *rest):
            return model.apply(vars_c, cast(imgs), *rest)
        return f

    to_bf16 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)

    # the cam_bf16 policy IS the shipped serving mode — measure the exact
    # library code path, not a local re-implementation that could drift
    from monoforce_tpu.models.terrain_encoder.lss import (
        half_inference_variables,
    )

    policies = {
        "f32": (variables, lambda x: x),
        "bf16": (to_bf16(variables), lambda x: x.astype(jnp.bfloat16)),
        "cam_bf16": (half_inference_variables(variables),
                     lambda x: x.astype(jnp.bfloat16)),
    }

    ref_out = None
    for name, (vars_c, cast) in policies.items():
        ms = _sustained_ms(run_with(vars_c, cast), *inputs, reps=reps)
        out = jax.tree.map(np.asarray, outputs_with(vars_c, cast)(*inputs))
        if ref_out is None:
            ref_out = out
            errs = {k: 0.0 for k in out}
            print(json.dumps({"out_mean_abs": {
                k: float(np.mean(np.abs(v))) for k, v in out.items()},
                "out_dtype": {k: str(v.dtype) for k, v in out.items()}}))
        else:
            errs = {k: float(np.sqrt(np.mean(
                (out[k].astype(np.float32) - ref_out[k]) ** 2)))
                for k in out}
        print(json.dumps({"policy": name, "ms": round(ms, 3),
                          "rmse_vs_f32": {k: round(v, 6)
                                          for k, v in errs.items()}}))


if __name__ == "__main__":
    main()
