"""Remat (jax.checkpoint) over rollout scan segments — SURVEY §5's
long-horizon BPTT strategy (replaces the reference's plain O(N) BPTT,
dphysics.py:490-496).

Checks: forward values identical, gradients match the unremat rollout, and
the compiled backward program's temp memory shrinks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import (RobotModel, auto_remat_segment,
                                          rollout)


@pytest.fixture(scope="module")
def robot():
    return RobotModel.from_config(PhysicsConfig(robot="tradr"))


def _case(B=2, N=500, seed=0):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.normal(scale=0.1, size=(B, 64, 64)).astype(np.float32))
    ctr = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    return z, ctr


def _loss(robot, z, ctr, remat_segment):
    def f(zg):
        states, _, _ = rollout(robot, zg, ctr, return_forces=False,
                               remat_segment=remat_segment)
        return jnp.sum(states.x ** 2) / ctr.shape[1]
    return f


def test_auto_segment_heuristic():
    assert auto_remat_segment(10) is None
    k = auto_remat_segment(500)
    assert k is not None and 500 % k == 0 and 10 <= k <= 50
    assert auto_remat_segment(256) in (16,)
    # prime horizon: no proper divisor -> falls back to no remat
    assert auto_remat_segment(509) is None


def test_remat_forward_identical(robot):
    z, ctr = _case(N=100)
    s_plain, _, _ = rollout(robot, z, ctr, return_forces=False)
    s_remat, _, _ = rollout(robot, z, ctr, return_forces=False,
                            remat_segment=20)
    # same math; XLA fuses the segmented program slightly differently (~1 ulp)
    np.testing.assert_allclose(np.asarray(s_plain.x), np.asarray(s_remat.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_plain.R), np.asarray(s_remat.R),
                               atol=1e-6)


def test_remat_gradients_match_full_horizon(robot):
    """T=500 BPTT at training shapes: remat grads == unremat grads."""
    z, ctr = _case(N=500)
    g_plain = jax.grad(_loss(robot, z, ctr, None))(z)
    g_remat = jax.grad(_loss(robot, z, ctr, auto_remat_segment(500)))(z)
    np.testing.assert_allclose(np.asarray(g_remat), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-7)


def test_remat_reduces_backward_memory(robot):
    """Compiled grad program temp memory stays within budget (the remat
    point: O(N/K + K) live state instead of O(N))."""
    z, ctr = _case(N=500)
    mem = {}
    for tag, seg in (("plain", None), ("remat", 20)):
        compiled = jax.jit(jax.grad(_loss(robot, z, ctr, seg))).lower(z).compile()
        ana = compiled.memory_analysis()
        if ana is None or not hasattr(ana, "temp_size_in_bytes"):
            pytest.skip("memory_analysis unavailable on this backend")
        mem[tag] = ana.temp_size_in_bytes
    assert mem["remat"] < mem["plain"], mem


def test_invalid_segment_raises(robot):
    z, ctr = _case(N=100)
    with pytest.raises(ValueError, match="must divide"):
        rollout(robot, z, ctr, return_forces=False, remat_segment=33)
