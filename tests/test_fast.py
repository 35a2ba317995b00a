"""Fast-path rollout: equivalence with the exact engine and API checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics.engine import RigidState, RobotModel, rollout
from monoforce_tpu.physics.fast import fast_rollout


@pytest.fixture(scope="module")
def robot():
    return RobotModel.from_config(PhysicsConfig(robot="tradr"))


def _rand(shape, scale=1.0, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        scale=scale, size=shape).astype(np.float32))


def test_fast_matches_exact_per_batch_grids(robot):
    B, N = 4, 100
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(scale=0.15, size=(B, 128, 128)).astype(np.float32))
    fr = jnp.asarray(rng.uniform(0.4, 1.0, (B, 128, 128)).astype(np.float32))
    ctr = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    s_exact, _, _ = rollout(robot, z, ctr, friction=fr, return_forces=False)
    s_fast, stats = fast_rollout(robot, z, ctr, friction=fr)
    # f32 op reordering (componentwise vs matmul) diverges chaotically on the
    # stiff dynamics; the parity gate is trajectory RMSE (BASELINE.md #1)
    rmse_x = float(np.sqrt(np.mean(
        (np.asarray(s_fast.x) - np.asarray(s_exact.x)) ** 2)))
    rmse_R = float(np.sqrt(np.mean(
        (np.asarray(s_fast.R) - np.asarray(s_exact.R)) ** 2)))
    assert rmse_x < 1e-3, rmse_x
    assert rmse_R < 5e-3, rmse_R  # rotation entries; radians-scale drift
    rmse_v = float(np.sqrt(np.mean(
        (np.asarray(s_fast.xd) - np.asarray(s_exact.xd)) ** 2)))
    assert rmse_v < 2e-2, rmse_v  # impact velocities are the noisiest signal
    assert stats.spring_std.shape == (B, N)


def test_fast_shared_grid(robot):
    B, N = 8, 60
    rng = np.random.default_rng(1)
    z1 = jnp.asarray(rng.normal(scale=0.1, size=(128, 128)).astype(np.float32))
    ctr = jnp.asarray(rng.uniform(-0.8, 0.8, (B, N, 2)).astype(np.float32))
    s_shared, _ = fast_rollout(robot, z1, ctr)
    s_batched, _ = fast_rollout(robot, jnp.broadcast_to(z1, (B, 128, 128)), ctr)
    np.testing.assert_allclose(np.asarray(s_shared.x), np.asarray(s_batched.x),
                               atol=1e-4)


def test_fast_stats_match_exact_forces(robot):
    """spring_std from the fast path equals the std of |F_spring| from the
    exact path's materialized forces."""
    B, N = 2, 40
    z = jnp.zeros((B, 128, 128))
    ctr = jnp.tile(jnp.asarray([[0.6, 0.2]]), (B, N, 1))
    _, forces, _ = rollout(robot, z, ctr, return_forces=True)
    _, stats = fast_rollout(robot, z, ctr)
    expected = np.std(np.linalg.norm(np.asarray(forces[0]), axis=-1), axis=-1)
    np.testing.assert_allclose(np.asarray(stats.spring_std), expected,
                               atol=1e-2, rtol=1e-3)


def test_fast_custom_state0_and_gradients(robot):
    B, N = 2, 30
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(scale=0.1, size=(128, 128)).astype(np.float32))
    ctr = jnp.tile(jnp.asarray([[0.5, 0.0]]), (B, N, 1))
    yaw = 0.5
    R0 = jnp.asarray([[np.cos(yaw), -np.sin(yaw), 0],
                      [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]], jnp.float32)
    s0 = RigidState(jnp.ones((B, 3)), jnp.zeros((B, 3)),
                    jnp.broadcast_to(R0, (B, 3, 3)), jnp.zeros((B, 3)))
    s_fast, _ = fast_rollout(robot, z, ctr, state0=s0)
    s_exact, _, _ = rollout(robot, jnp.broadcast_to(z, (B, 128, 128)), ctr,
                            state0=s0, return_forces=False)
    np.testing.assert_allclose(np.asarray(s_fast.x), np.asarray(s_exact.x),
                               atol=2e-3)

    # gradients flow through the fast path too
    def loss(zg):
        s, _ = fast_rollout(robot, zg, ctr, state0=s0)
        return jnp.mean(s.x[:, :, 2] ** 2)

    g = jax.grad(loss)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_fast_marv_and_husky(robot):
    for name in ("marv", "husky"):
        cfg = PhysicsConfig(robot=name)
        rb = RobotModel.from_config(cfg)
        B, N = 2, 50
        z = jnp.zeros((128, 128))
        ctr = jnp.tile(jnp.asarray([[0.7, 0.1]]), (B, N, 1))
        s_fast, _ = fast_rollout(rb, z, ctr)
        s_exact, _, _ = rollout(rb, jnp.zeros((B, 128, 128)), ctr,
                                return_forces=False)
        np.testing.assert_allclose(np.asarray(s_fast.x), np.asarray(s_exact.x),
                                   atol=2e-3)


def test_planner_rollout_matches_fast(robot):
    """planner_rollout (fused step kernel + vectorized integration; packed
    single mode at the default 0.11 m preset) vs fast_rollout on per-batch
    planner-regime terrain with spatially-varying friction.  The serving
    path quantizes terrain taps to bf16; sub-mm agreement holds on smooth
    terrain (the chaotic sigma=0.15 contact regime is covered by the rough-
    terrain bound test below)."""
    from monoforce_tpu.physics.fast import planner_rollout
    B, N = 4, 100
    rng = np.random.default_rng(3)
    gx, gy = np.meshgrid(np.linspace(-6.4, 6.4, 128),
                         np.linspace(-6.4, 6.4, 128), indexing="ij")
    base = 0.3 * np.exp(-((gx - 1.5) ** 2 / 3.0 + gy ** 2 / 5.0))
    z = jnp.asarray(np.stack([base * (0.5 + 0.3 * b) for b in range(B)])
                    .astype(np.float32))
    fr = jnp.asarray(rng.uniform(0.4, 1.0, (B, 128, 128)).astype(np.float32))
    ctr = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    s_fast, st_fast = fast_rollout(robot, z, ctr, friction=fr)
    s_plan, st_plan = planner_rollout(robot, z, ctr, friction=fr)
    rmse_x = float(np.sqrt(np.mean(
        (np.asarray(s_plan.x) - np.asarray(s_fast.x)) ** 2)))
    rmse_R = float(np.sqrt(np.mean(
        (np.asarray(s_plan.R) - np.asarray(s_fast.R)) ** 2)))
    assert rmse_x < 1e-3, rmse_x
    assert rmse_R < 5e-3, rmse_R
    # cost statistics agree (the planner consumes these)
    np.testing.assert_allclose(np.asarray(st_plan.spring_std),
                               np.asarray(st_fast.spring_std),
                               atol=1.0, rtol=0.05)


def test_planner_rollout_fallbacks(robot):
    """rk4 and marv (>0 joints OK, articulation unsupported) fall back to
    fast_rollout; results still match the exact engine."""
    from monoforce_tpu.physics.fast import planner_rollout
    cfg = PhysicsConfig(robot="tradr", integration_mode="rk4")
    rb = RobotModel.from_config(cfg)
    B, N = 2, 30
    z = jnp.zeros((128, 128))
    ctr = jnp.tile(jnp.asarray([[0.5, 0.1]]), (B, N, 1))
    s_p, _ = planner_rollout(rb, z, ctr)
    s_e, _, _ = rollout(rb, jnp.zeros((B, 128, 128)), ctr, return_forces=False)
    np.testing.assert_allclose(np.asarray(s_p.x), np.asarray(s_e.x), atol=2e-3)


def test_fast_marv_flipper_articulation():
    """fast_rollout with time-varying joint_angles matches the exact engine
    (VERDICT item: flipper joint angles in the fast path)."""
    cfg = PhysicsConfig(robot="marv")
    rb = RobotModel.from_config(cfg)
    B, N = 2, 60
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(scale=0.1, size=(128, 128)).astype(np.float32))
    ctr = jnp.tile(jnp.asarray([[0.6, 0.1]]), (B, N, 1))
    t = np.linspace(0, 1, N, dtype=np.float32)
    ja = np.stack([0.4 * np.sin(2 * np.pi * t), 0.4 * np.cos(2 * np.pi * t),
                   -0.3 * t, 0.3 * t], axis=-1)
    ja = jnp.asarray(np.tile(ja[None], (B, 1, 1)))
    s_fast, _ = fast_rollout(rb, z, ctr, joint_angles=ja)
    s_exact, _, _ = rollout(rb, jnp.broadcast_to(z, (B, 128, 128)), ctr,
                            joint_angles=ja, return_forces=False)
    rmse_x = float(np.sqrt(np.mean(
        (np.asarray(s_fast.x) - np.asarray(s_exact.x)) ** 2)))
    assert rmse_x < 2e-3, rmse_x
    rmse_R = float(np.sqrt(np.mean(
        (np.asarray(s_fast.R) - np.asarray(s_exact.R)) ** 2)))
    assert rmse_R < 5e-3, rmse_R


def _spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean(); rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra ** 2).sum() * (rb ** 2).sum()))


def test_planner_pair_mode_gates():
    """Serving-grade pair mode (P<=64 preset, trajectory-pair register
    packing, bf16 taps, nearest-cell friction, REFRESH=16): gated on
    trajectory RMSE and within-preset cost-ranking agreement vs the exact
    fast path.  (Across contact presets the force-variance ranking is
    resolution-sensitive for ANY preset incl. the reference's 0.1 m voxel —
    measured in docs/PERFORMANCE.md.)"""
    from monoforce_tpu.physics.fast import planner_rollout
    from monoforce_tpu.physics.controls import shooting_controls
    from monoforce_tpu.planner.shooting import (
        force_variance_cost, inclination_cost,
    )
    cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=0.15)
    rb = RobotModel.from_config(cfg)
    assert rb.points.shape[0] <= 64  # pair-packable preset

    # planner-regime terrain: smooth hill + gentle ripples
    gx, gy = cfg.grid_coords()
    z = jnp.asarray((0.35 * np.exp(-((gx - 2.0) ** 2 / 3.0 + gy ** 2 / 6.0))
                     + 0.08 * np.sin(2.2 * gx) * np.cos(1.7 * gy))
                    .astype(np.float32))
    ctr, _ = shooting_controls(jax.random.PRNGKey(7), 64, 1.0, 1.0, 1.0, 0.01)

    s_exact, st_exact = fast_rollout(rb, z, ctr)
    s_pair, st_pair = planner_rollout(rb, z, ctr)
    rmse_x = float(np.sqrt(np.mean(
        (np.asarray(s_pair.x) - np.asarray(s_exact.x)) ** 2)))
    # gates tightened to the measured margins (VERDICT r2 #7): 0.2 mm RMSE
    # and Spearman 0.997/0.9997 measured — a 5x regression now fails CI
    assert rmse_x < 1e-3, rmse_x

    fv_e = np.asarray(force_variance_cost(st_exact.spring_std))
    fv_p = np.asarray(force_variance_cost(st_pair.spring_std))
    ic_e = np.asarray(inclination_cost(st_exact.abs_roll, st_exact.abs_pitch))
    ic_p = np.asarray(inclination_cost(st_pair.abs_roll, st_pair.abs_pitch))
    assert _spearman(fv_e, fv_p) > 0.99
    assert _spearman(ic_e, ic_p) > 0.99


@pytest.mark.parametrize("n_traj,mode", [(32, "pair3"), (28, "packed")])
def test_planner_packed_modes_gates(n_traj, mode):
    """The 64 < P <= 192 serving paths at the REFERENCE's own 0.1 m contact
    resolution (P=148, dphys_config.py:8) and the 0.11 m default preset
    (P=97) match the exact fast path on planner-regime terrain; the only
    trade is bf16 tap quantization (the friction taps keep the exact
    reference bilinear weights, unlike pair mode's nearest-cell).

    B=32 (divisible by 16) dispatches pair3 mode (two trajectories across
    three registers, fk_step_pair3); B=28 falls back to packed single mode
    (fk_step_packed) — both gated to the same bounds."""
    from monoforce_tpu.physics.fast import planner_rollout
    from monoforce_tpu.physics.controls import shooting_controls
    from monoforce_tpu.planner.shooting import (
        force_variance_cost, inclination_cost,
    )
    for voxel, p_expect in ((0.1, 148), (0.11, 97)):
        cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=voxel)
        rb = RobotModel.from_config(cfg)
        assert rb.points.shape[0] == p_expect, rb.points.shape

        gx, gy = cfg.grid_coords()
        z = jnp.asarray((0.35 * np.exp(-((gx - 2.0) ** 2 / 3.0
                                         + gy ** 2 / 6.0))
                         + 0.08 * np.sin(2.2 * gx) * np.cos(1.7 * gy))
                        .astype(np.float32))
        ctr, _ = shooting_controls(jax.random.PRNGKey(7), n_traj, 1.0, 1.0,
                                   1.0, 0.01)

        s_exact, st_exact = fast_rollout(rb, z, ctr)
        s_one, st_one = planner_rollout(rb, z, ctr)
        rmse_x = float(np.sqrt(np.mean(
            (np.asarray(s_one.x) - np.asarray(s_exact.x)) ** 2)))
        assert rmse_x < 1e-3, (voxel, rmse_x)

        fv_e = np.asarray(force_variance_cost(st_exact.spring_std))
        fv_p = np.asarray(force_variance_cost(st_one.spring_std))
        ic_e = np.asarray(inclination_cost(st_exact.abs_roll,
                                           st_exact.abs_pitch))
        ic_p = np.asarray(inclination_cost(st_one.abs_roll,
                                           st_one.abs_pitch))
        assert _spearman(fv_e, fv_p) > 0.99, (mode, voxel)
        assert _spearman(ic_e, ic_p) > 0.99, (mode, voxel)


@pytest.mark.parametrize("voxel,p_expect", [(0.1, 148), (0.15, 62)])
def test_planner_pair3_zu_matches_general(voxel, p_expect):
    """The uniform-friction serving kernels (fk_step_pair3_zu at 0.1 m —
    two lane gathers per step over [z(i,j)|z(i,j+1)] packed words, no
    friction math; fk_step_pair_zu at the 0.15 m pair preset — no
    nearest-cell mu gather, z pair-word plane alone; both dispatched when
    friction=None, the reference dphysics.py:561-563 default) reproduce the
    general paths run with an explicit all-ones friction grid.  The paths
    quantize the SAME z values to bf16 and the uniform mu=1 is exact in
    both, so agreement is at float accumulation roundoff, not quantization,
    level."""
    from monoforce_tpu.physics.fast import planner_rollout
    from monoforce_tpu.physics.controls import shooting_controls
    cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=voxel)
    rb = RobotModel.from_config(cfg)
    assert rb.points.shape[0] == p_expect

    gx, gy = cfg.grid_coords()
    z = jnp.asarray((0.35 * np.exp(-((gx - 2.0) ** 2 / 3.0 + gy ** 2 / 6.0))
                     + 0.08 * np.sin(2.2 * gx) * np.cos(1.7 * gy))
                    .astype(np.float32))
    ctr, _ = shooting_controls(jax.random.PRNGKey(9), 32, 1.0, 1.0, 1.0, 0.01)

    s_zu, st_zu = planner_rollout(rb, z, ctr)                    # zu kernel
    s_gen, st_gen = planner_rollout(rb, z, ctr,
                                    friction=jnp.ones_like(z))   # general
    np.testing.assert_allclose(np.asarray(s_zu.x), np.asarray(s_gen.x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_zu.R), np.asarray(s_gen.R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_zu.spring_std),
                               np.asarray(st_gen.spring_std),
                               atol=1e-3, rtol=1e-4)


def test_fk_step_exact_vs_packed_taps():
    """fk_step (exact f32 taps) is the accuracy reference for the serving
    kernels: fk_step_packed's bf16 [z|mu] taps reproduce its accelerations
    to the bf16 quantization bound on the same windows/state."""
    from monoforce_tpu.ops.fk_step_pallas import (
        fk_step, fk_step_packed, pack_consts, pack_points,
    )
    from monoforce_tpu.physics.fast import (
        _extract_windows, _extract_windows_packed1, _make_consts, _world_xy,
        _unpack_state,
    )
    from monoforce_tpu.physics.engine import RigidState

    cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=0.11)
    rb = RobotModel.from_config(cfg)
    rng = np.random.default_rng(5)
    B = 8
    z = jnp.asarray(rng.normal(scale=0.1, size=(128, 128)).astype(np.float32))
    fr = jnp.asarray(rng.uniform(0.3, 1.0, (128, 128)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, (B, 3)).astype(np.float32))
    state0 = RigidState(x, jnp.zeros((B, 3)),
                        jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                        jnp.zeros((B, 3)))
    c = _make_consts(rb)
    st = _unpack_state(state0)
    wx, wy = _world_xy(c, st, c.px, c.py, c.pz)
    sxy, patch = _extract_windows(z, fr, wx, wy, rb.d_max, rb.grid_res)
    sxy1, patch1 = _extract_windows_packed1(z, fr, wx, wy, rb.d_max,
                                            rb.grid_res)
    np.testing.assert_allclose(np.asarray(sxy), np.asarray(sxy1))
    cst = pack_consts(rb)
    pts = pack_points(rb)
    state18 = jnp.stack(st, axis=1)
    tv = jnp.zeros((B, 8), jnp.float32).at[:, 0].set(0.5).at[:, 1].set(0.4)
    acc_exact = np.asarray(fk_step(cst, patch, state18, tv, sxy, pts))
    acc_packed = np.asarray(fk_step_packed(cst, patch1, state18, tv, sxy,
                                           pts))
    # accelerations agree to the bf16 tap bound (values O(10) m/s^2)
    np.testing.assert_allclose(acc_packed[:, :6], acc_exact[:, :6],
                               atol=0.3, rtol=0.02)
    np.testing.assert_allclose(acc_packed[:, 7], acc_exact[:, 7],
                               rtol=0.02)  # contact counts


def test_fk_step_exact_vs_pair3_taps():
    """fk_step_pair3 (two trajectories across three 192-lane halves, bf16
    [z|mu] tap words, exact bilinear friction) reproduces fk_step's exact
    accelerations to the bf16 quantization bound on the same windows/state,
    for both reference-resolution presets (P=148, P=97)."""
    from monoforce_tpu.ops.fk_step_pallas import (
        fk_step, fk_step_pair3, pack_consts, pack_points, pack_points_pair3,
    )
    from monoforce_tpu.physics.fast import (
        _extract_windows, _extract_windows_packed1, _make_consts, _world_xy,
        _unpack_state,
    )
    from monoforce_tpu.physics.engine import RigidState

    for voxel in (0.1, 0.11):
        cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=voxel)
        rb = RobotModel.from_config(cfg)
        rng = np.random.default_rng(5)
        B = 8
        z = jnp.asarray(rng.normal(scale=0.1,
                                   size=(128, 128)).astype(np.float32))
        fr = jnp.asarray(rng.uniform(0.3, 1.0, (128, 128)).astype(np.float32))
        x = jnp.asarray(rng.uniform(-1, 1, (B, 3)).astype(np.float32))
        state0 = RigidState(x, jnp.zeros((B, 3)),
                            jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                            jnp.zeros((B, 3)))
        c = _make_consts(rb)
        st = _unpack_state(state0)
        wx, wy = _world_xy(c, st, c.px, c.py, c.pz)
        sxy, patch = _extract_windows(z, fr, wx, wy, rb.d_max, rb.grid_res)
        _, patch1 = _extract_windows_packed1(z, fr, wx, wy, rb.d_max,
                                             rb.grid_res)
        cst = pack_consts(rb)
        state18 = jnp.stack(st, axis=1)
        tv = jnp.zeros((B, 8), jnp.float32).at[:, 0].set(0.5).at[:, 1].set(0.4)
        acc_exact = np.asarray(fk_step(cst, patch, state18, tv, sxy,
                                       pack_points(rb)))
        acc3 = np.asarray(fk_step_pair3(
            cst, patch1.reshape(-1, 512), state18.reshape(-1, 36),
            tv.reshape(-1, 16), sxy.reshape(-1, 4),
            pack_points_pair3(rb))).reshape(-1, 8)
        np.testing.assert_allclose(acc3[:, :6], acc_exact[:, :6],
                                   atol=0.3, rtol=0.02)
        np.testing.assert_allclose(acc3[:, 7], acc_exact[:, 7],
                                   rtol=0.02)  # contact counts


def test_muq_taps_vs_exact_pair3():
    """fk_step_pair3_muq (z-pair words + ONE u8 friction-quad gather — the
    3-gather information floor) reproduces fk_step_pair3's accelerations
    (exact bf16 bilinear mu, the oracle) to the u8 quantization bound on
    the same windows/state, for both reference-resolution presets.  The z
    taps quantize identically in both layouts, so the ONLY delta is mu's
    u8 step (<=1/128 absolute) propagating through the friction force."""
    from monoforce_tpu.ops.fk_step_pallas import (
        fk_step_pair3, fk_step_pair3_muq, pack_consts, pack_points_pair3,
    )
    from monoforce_tpu.physics.fast import (
        _extract_windows_packed1, _extract_windows_zmuq, _make_consts,
        _world_xy, _unpack_state, quantize_mu_grid,
    )
    from monoforce_tpu.physics.engine import RigidState

    for voxel in (0.1, 0.11):
        cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=voxel)
        rb = RobotModel.from_config(cfg)
        rng = np.random.default_rng(5)
        B = 8
        z = jnp.asarray(rng.normal(scale=0.1,
                                   size=(128, 128)).astype(np.float32))
        fr = jnp.asarray(rng.uniform(0.3, 1.0, (128, 128)).astype(np.float32))
        x = jnp.asarray(rng.uniform(-1, 1, (B, 3)).astype(np.float32))
        state0 = RigidState(x, jnp.zeros((B, 3)),
                            jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                            jnp.zeros((B, 3)))
        c = _make_consts(rb)
        st = _unpack_state(state0)
        wx, wy = _world_xy(c, st, c.px, c.py, c.pz)
        _, patch1 = _extract_windows_packed1(z, fr, wx, wy, rb.d_max,
                                             rb.grid_res)
        sxy, patchq = _extract_windows_zmuq(z, quantize_mu_grid(fr), wx, wy,
                                            rb.d_max, rb.grid_res)
        cst = pack_consts(rb)
        state18 = jnp.stack(st, axis=1)
        tv = jnp.zeros((B, 8), jnp.float32).at[:, 0].set(0.5).at[:, 1].set(0.4)
        pts3 = pack_points_pair3(rb)
        acc_o = np.asarray(fk_step_pair3(
            cst, patch1.reshape(-1, 512), state18.reshape(-1, 36),
            tv.reshape(-1, 16), sxy.reshape(-1, 4), pts3)).reshape(-1, 8)
        acc_q = np.asarray(fk_step_pair3_muq(
            cst, patchq.reshape(-1, 1024), state18.reshape(-1, 36),
            tv.reshape(-1, 16), sxy.reshape(-1, 4), pts3)).reshape(-1, 8)
        # contact counts and spring-driven stats are mu-independent
        np.testing.assert_allclose(acc_q[:, 7], acc_o[:, 7], rtol=1e-6)
        np.testing.assert_allclose(acc_q[:, :6], acc_o[:, :6],
                                   atol=0.05, rtol=0.01)


def test_muq_cost_ranking_with_friction():
    """The muq serving path (the fused node's flagship workload: 0.1 m
    cloud + a non-uniform friction grid, monoforce_node.py:157-159) keeps
    within-preset cost rankings and trajectory RMSE vs the exact fast path
    — same gates as the other serving modes."""
    from monoforce_tpu.physics.fast import planner_rollout
    from monoforce_tpu.physics.controls import shooting_controls
    from monoforce_tpu.planner.shooting import (
        force_variance_cost, inclination_cost,
    )
    cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=0.1)
    rb = RobotModel.from_config(cfg)
    assert rb.points.shape[0] == 148

    gx, gy = cfg.grid_coords()
    z = jnp.asarray((0.35 * np.exp(-((gx - 2.0) ** 2 / 3.0 + gy ** 2 / 6.0))
                     + 0.08 * np.sin(2.2 * gx) * np.cos(1.7 * gy))
                    .astype(np.float32))
    fr = jnp.asarray((0.7 + 0.25 * np.sin(1.3 * gx) * np.cos(0.9 * gy))
                     .astype(np.float32))
    ctr, _ = shooting_controls(jax.random.PRNGKey(7), 32, 1.0, 1.0, 1.0, 0.01)

    s_exact, st_exact = fast_rollout(rb, z, ctr, friction=fr)
    s_q, st_q = planner_rollout(rb, z, ctr, friction=fr)
    rmse_x = float(np.sqrt(np.mean(
        (np.asarray(s_q.x) - np.asarray(s_exact.x)) ** 2)))
    assert rmse_x < 2e-3, rmse_x

    fv_e = np.asarray(force_variance_cost(st_exact.spring_std))
    fv_q = np.asarray(force_variance_cost(st_q.spring_std))
    ic_e = np.asarray(inclination_cost(st_exact.abs_roll, st_exact.abs_pitch))
    ic_q = np.asarray(inclination_cost(st_q.abs_roll, st_q.abs_pitch))
    assert _spearman(fv_e, fv_q) > 0.99
    assert _spearman(ic_e, ic_q) > 0.99


@pytest.mark.parametrize("B", [4, 16])  # 4 -> packed single, 16 -> pair3
def test_planner_packed_rough_terrain_rmse(B):
    """Packed single AND pair3 modes stay within the documented bf16-tap
    trade on rough per-batch terrain with varying friction (same bound as
    pair mode's rough gate)."""
    from monoforce_tpu.physics.fast import planner_rollout
    cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=0.1)
    rb = RobotModel.from_config(cfg)
    rng = np.random.default_rng(42)
    N = 100
    z = jnp.asarray(rng.normal(scale=0.1, size=(B, 128, 128)).astype(np.float32))
    fr = jnp.asarray(rng.uniform(0.4, 1.0, (B, 128, 128)).astype(np.float32))
    ctr = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    s_exact, _ = fast_rollout(rb, z, ctr, friction=fr)
    s_one, _ = planner_rollout(rb, z, ctr, friction=fr)
    rmse_x = float(np.sqrt(np.mean(
        (np.asarray(s_one.x) - np.asarray(s_exact.x)) ** 2)))
    assert rmse_x < 2e-2, rmse_x


def test_planner_pair_mode_rough_terrain_rmse():
    """Pair mode stays within the documented trade on rough terrain and
    per-batch grids with a spatially-varying friction map."""
    from monoforce_tpu.physics.fast import planner_rollout
    cfg = PhysicsConfig(robot="tradr", mesh_voxel_size=0.15)
    rb = RobotModel.from_config(cfg)
    rng = np.random.default_rng(42)
    B, N = 4, 100
    z = jnp.asarray(rng.normal(scale=0.1, size=(B, 128, 128)).astype(np.float32))
    fr = jnp.asarray(rng.uniform(0.4, 1.0, (B, 128, 128)).astype(np.float32))
    ctr = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    s_exact, _ = fast_rollout(rb, z, ctr, friction=fr)
    s_pair, _ = planner_rollout(rb, z, ctr, friction=fr)
    rmse_x = float(np.sqrt(np.mean(
        (np.asarray(s_pair.x) - np.asarray(s_exact.x)) ** 2)))
    assert rmse_x < 2e-2, rmse_x


def test_fast_oob_speed_bound_degrades_gracefully(robot):
    """Driving faster than the documented window-drift bound (|v| well above
    2.5 m/s between REFRESH=8 refreshes) must clamp taps to the stale window
    edge — not NaN, not fly off: the weak spot called out in round 1 (the
    yaw-rotation bound had a test; the speed bound did not)."""
    B, N = 4, 100
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.normal(scale=0.1, size=(128, 128)).astype(np.float32))
    # v = 4 m/s: 0.32 m drift per refresh window (> 2-cell margin)
    ctr = jnp.tile(jnp.asarray([[4.0, 0.3]]), (B, N, 1))
    s_fast, stats = fast_rollout(robot, z, ctr)
    assert np.isfinite(np.asarray(s_fast.x)).all()
    assert np.isfinite(np.asarray(stats.spring_std)).all()
    # graceful: the body stays near the terrain surface (no tunnel-through /
    # launch into space) even with stale-window clamping
    zs = np.asarray(s_fast.x)[..., 2]
    assert zs.min() > -2.0 and zs.max() < 3.0, (zs.min(), zs.max())


def test_planner_pair_mode_all_robots():
    """PhysicsConfig.for_planner gives every robot a pair-packable preset
    (P <= 64) and the planner rollout matches the exact path on all of them
    (marv runs un-articulated here, like the reference online planner)."""
    from monoforce_tpu.physics.fast import planner_rollout
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.normal(scale=0.08, size=(128, 128)).astype(np.float32))
    for name in ("tradr", "marv", "husky"):
        cfg = PhysicsConfig.for_planner(name)
        rb = RobotModel.from_config(cfg)
        assert rb.points.shape[0] <= 64, name
        B, N = 2, 60
        ctr = jnp.tile(jnp.asarray([[0.6, 0.15]]), (B, N, 1))
        s_p, st = planner_rollout(rb, z, ctr)
        s_e, _ = fast_rollout(rb, z, ctr)
        rmse = float(np.sqrt(np.mean(
            (np.asarray(s_p.x) - np.asarray(s_e.x)) ** 2)))
        assert rmse < 5e-3, (name, rmse)
        assert np.isfinite(np.asarray(st.spring_std)).all()


@pytest.mark.smoke
def test_planner_kernel_mode_pins_presets():
    """Every named serving preset must engage its intended kernel mode.

    planner_rollout routes its dispatch through planner_kernel_mode, so this
    pin IS the dispatch: a refactor that silently demotes a preset to a
    slower mode (e.g. pair -> packed) would pass every accuracy gate while
    losing the measured latency (docs/PERFORMANCE.md).  The pinned pairs are
    the benchmarked workloads: the 0.15 m serving presets (bench.py headline,
    BENCH_ALL online tick), the reference's 0.1 m contact resolution
    (dphys_config.py:8; bench.py reference-resolution lines), and the
    fallback/packed demotions that are SUPPOSED to happen."""
    from monoforce_tpu.physics.fast import planner_kernel_mode

    # 0.15 m-class serving presets: pair packing, zu when friction uniform
    for name in ("tradr", "marv", "husky"):
        rb = RobotModel.from_config(PhysicsConfig.for_planner(name))
        assert planner_kernel_mode(rb, 64) == "pair_zu", name
        assert planner_kernel_mode(rb, 64, uniform_friction=False) == "pair", name

    # reference 0.1 m contact resolution (P=148): pair3 packing
    rb_ref = RobotModel.from_config(
        PhysicsConfig(robot="tradr", mesh_voxel_size=0.1))
    assert rb_ref.points.shape[0] == 148
    assert planner_kernel_mode(rb_ref, 64) == "pair3_zu"
    assert planner_kernel_mode(rb_ref, 64,
                               uniform_friction=False) == "pair3_muq"

    # batches that cannot pair (B % 16 != 0) demote to packed single mode
    assert planner_kernel_mode(rb_ref, 50) == "packed"

    # non-euler integration falls back to fast_rollout
    rb_rk4 = RobotModel.from_config(
        PhysicsConfig(robot="tradr", integration_mode="rk4"))
    assert planner_kernel_mode(rb_rk4, 64) == "fallback"
