"""Physics-engine tests: oracle parity, physical invariants, vmap/jit
consistency, and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoforce_tpu.config import PhysicsConfig
from monoforce_tpu.physics import (
    DPhysics, RigidState, RobotModel, inertia_tensor, integrate_rotation, rollout,
)
from oracle import oracle_rollout, inertia as oracle_inertia


@pytest.fixture(scope="module")
def cfg():
    return PhysicsConfig(robot="tradr")


@pytest.fixture(scope="module")
def marv_cfg():
    return PhysicsConfig(robot="marv")


def _gaussian_hill(cfg, height=0.6, sx=1.5, sy=2.0, cx=2.0, cy=0.0):
    gx, gy = cfg.grid_coords()
    return (height * np.exp(-((gx - cx) ** 2 / (2 * sx ** 2)
                              + (gy - cy) ** 2 / (2 * sy ** 2)))).astype(np.float32)


def _run_both(cfg, z_np, controls_np, n_steps, state0=None, friction_np=None,
              joint_angles_np=None):
    robot = RobotModel.from_config(cfg)
    B = 1
    z = jnp.asarray(z_np)[None]
    controls = jnp.asarray(controls_np)[None]
    friction = None if friction_np is None else jnp.asarray(friction_np)[None]
    ja = None if joint_angles_np is None else jnp.asarray(joint_angles_np)[None]
    st = None
    if state0 is not None:
        st = RigidState(*[jnp.asarray(s, jnp.float32)[None] for s in state0])
    states, forces, _ = rollout(robot, z, controls, joint_angles=ja,
                                state0=st, friction=friction)

    if state0 is None:
        x0 = np.zeros(3, np.float32)
        xd0 = np.array([controls_np[0, 0], 0, 0], np.float32)
        R0 = np.eye(3, dtype=np.float32)
        w0 = np.array([0, 0, controls_np[0, 1]], np.float32)
        state0 = (x0, xd0, R0, w0)
    ref = oracle_rollout(
        cfg.robot_points, cfg.driving_parts.astype(np.float32), cfg.robot_mass,
        cfg.robot_size, z_np,
        friction_np if friction_np is not None else np.ones_like(z_np),
        controls_np, state0, cfg.d_max, cfg.grid_res, cfg.dt,
        cfg.stiffness, cfg.damping, omega_max=cfg.omega_max,
        joint_angles=joint_angles_np,
        joint_positions=np.asarray([cfg.joint_positions[k]
                                    for k in ("fl", "fr", "rl", "rr")], np.float32),
        flippers=("marv" in cfg.robot))
    return states, forces, ref


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


class TestOracleParity:
    def test_flat_terrain_straight_drive(self, cfg):
        n = 100
        z = np.zeros(cfg.grid_shape, np.float32)
        controls = np.tile(np.array([[0.8, 0.0]], np.float32), (n, 1))
        states, forces, ref = _run_both(cfg, z, controls, n)
        assert _rmse(states.x[0], ref["Xs"]) < 1e-3
        assert _rmse(states.R[0], ref["Rs"]) < 1e-3
        assert _rmse(forces[0][0], ref["F_springs"]) < 1e-2

    def test_gaussian_hill_turning(self, cfg):
        n = 200
        z = _gaussian_hill(cfg)
        controls = np.tile(np.array([[0.7, 0.4]], np.float32), (n, 1))
        states, forces, ref = _run_both(cfg, z, controls, n)
        assert _rmse(states.x[0], ref["Xs"]) < 1e-3
        assert _rmse(states.xd[0], ref["Xds"]) < 1e-2
        assert _rmse(states.R[0], ref["Rs"]) < 1e-3
        assert _rmse(states.omega[0], ref["Omegas"]) < 1e-2

    def test_step_terrain_with_friction_map(self, cfg):
        n = 150
        gx, _ = cfg.grid_coords()
        z = (0.15 * (gx > 1.5)).astype(np.float32)
        fr = (0.5 + 0.4 * (gx < 0)).astype(np.float32)
        controls = np.tile(np.array([[1.0, -0.2]], np.float32), (n, 1))
        states, _, ref = _run_both(cfg, z, controls, n, friction_np=fr)
        assert _rmse(states.x[0], ref["Xs"]) < 1e-3

    def test_custom_initial_state(self, cfg):
        n = 80
        z = _gaussian_hill(cfg, height=0.3)
        controls = np.tile(np.array([[0.5, 0.1]], np.float32), (n, 1))
        yaw = 0.7
        R0 = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                       [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]], np.float32)
        state0 = (np.array([1.0, -0.5, 0.0], np.float32),
                  np.zeros(3, np.float32), R0, np.zeros(3, np.float32))
        states, _, ref = _run_both(cfg, z, controls, n, state0=state0)
        assert _rmse(states.x[0], ref["Xs"]) < 1e-3

    def test_marv_flipper_joints(self, marv_cfg):
        n = 60
        z = np.zeros(marv_cfg.grid_shape, np.float32)
        controls = np.tile(np.array([[0.5, 0.0]], np.float32), (n, 1))
        t = np.arange(n, dtype=np.float32) * marv_cfg.dt
        ja = np.stack([0.3 * np.sin(t), 0.3 * np.sin(t),
                       -0.2 * np.cos(t), -0.2 * np.cos(t)], axis=1).astype(np.float32)
        states, _, ref = _run_both(marv_cfg, z, controls, n, joint_angles_np=ja)
        assert _rmse(states.x[0], ref["Xs"]) < 1e-3
        assert _rmse(states.R[0], ref["Rs"]) < 1e-3

    def test_full_horizon_500_steps(self, cfg):
        """Benchmark config #1: T=5 s @ dt=0.01 parity gate (RMSE < 1e-3)."""
        n = cfg.n_sim_steps
        z = _gaussian_hill(cfg, height=0.4, cx=1.0)
        controls = np.tile(np.array([[0.6, 0.15]], np.float32), (n, 1))
        states, _, ref = _run_both(cfg, z, controls, n)
        assert _rmse(states.x[0], ref["Xs"]) < 1e-3


class TestPhysicalInvariants:
    def test_flat_ground_settles_near_equilibrium(self, cfg):
        """On flat ground with zero controls the body stays near z~0 after the
        equilibrium offset (sink-in = mg/k is compensated, dphysics.py:586-589)."""
        n = 400
        robot = RobotModel.from_config(cfg)
        z = jnp.zeros((1,) + cfg.grid_shape)
        controls = jnp.zeros((1, n, 2))
        states, _, _ = rollout(robot, z, controls)
        tail = np.asarray(states.x[0, -50:, 2])
        assert np.abs(tail).max() < 0.05

    def test_drives_forward(self, cfg):
        robot = RobotModel.from_config(cfg)
        n = 300
        z = jnp.zeros((1,) + cfg.grid_shape)
        controls = jnp.tile(jnp.asarray([[1.0, 0.0]]), (1, n, 1))
        states, _, _ = rollout(robot, z, controls)
        x_final = float(states.x[0, -1, 0])
        assert 1.0 < x_final < 3.5  # ~3 m commanded; slip makes it less
        assert abs(float(states.x[0, -1, 1])) < 0.3

    def test_turning_changes_heading(self, cfg):
        robot = RobotModel.from_config(cfg)
        n = 300
        z = jnp.zeros((1,) + cfg.grid_shape)
        controls = jnp.tile(jnp.asarray([[0.5, 0.8]]), (1, n, 1))
        states, _, _ = rollout(robot, z, controls)
        yaw = float(jnp.arctan2(states.R[0, -1, 1, 0], states.R[0, -1, 0, 0]))
        assert yaw > 0.5

    def test_rotations_stay_orthonormal(self, cfg):
        robot = RobotModel.from_config(cfg)
        n = 500
        z = jnp.zeros((1,) + cfg.grid_shape)
        controls = jnp.tile(jnp.asarray([[0.9, 1.2]]), (1, n, 1))
        states, _, _ = rollout(robot, z, controls)
        R = np.asarray(states.R[0, -1])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)

    def test_inertia_matches_oracle_and_symmetry(self, cfg):
        pts = cfg.robot_points
        I = np.asarray(inertia_tensor(cfg.robot_mass, jnp.asarray(pts)))
        np.testing.assert_allclose(I, oracle_inertia(cfg.robot_mass, pts), rtol=1e-5)
        np.testing.assert_allclose(I, I.T, atol=1e-6)
        assert np.all(np.linalg.eigvalsh(I) > 0)

    def test_rodrigues_vs_expm(self):
        from scipy.linalg import expm
        rng = np.random.default_rng(0)
        for _ in range(5):
            w = rng.normal(size=3).astype(np.float32)
            R0 = np.eye(3, dtype=np.float32)
            dt = 0.01
            K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
            expected = R0 @ expm(K * dt)
            got = np.asarray(integrate_rotation(jnp.asarray(R0), jnp.asarray(w), dt))
            np.testing.assert_allclose(got, expected, atol=1e-5)


class TestBatchingAndJit:
    def test_vmap_matches_loop(self, cfg):
        robot = RobotModel.from_config(cfg)
        n, B = 50, 4
        rng = np.random.default_rng(7)
        z = jnp.asarray(rng.normal(scale=0.1, size=(B,) + cfg.grid_shape).astype(np.float32))
        controls = jnp.asarray(rng.uniform(-1, 1, (B, n, 2)).astype(np.float32))
        states_b, forces_b, _ = rollout(robot, z, controls)
        for i in range(B):
            s_i, f_i, _ = rollout(robot, z[i:i + 1], controls[i:i + 1])
            # batched vs unbatched compilations reorder f32 FMAs; forces are
            # O(10 N) so a few 1e-3 absolute is roundoff, not semantics
            np.testing.assert_allclose(states_b.x[i], s_i.x[0], atol=1e-4)
            np.testing.assert_allclose(forces_b[0][i], f_i[0][0], atol=5e-3)

    def test_extras_fn_and_no_forces(self, cfg):
        robot = RobotModel.from_config(cfg)
        n, B = 30, 2
        z = jnp.zeros((B,) + cfg.grid_shape)
        controls = jnp.tile(jnp.asarray([[0.5, 0.0]]), (B, n, 1))

        def extras(state, forces):
            f_s, _ = forces
            return jnp.std(jnp.linalg.norm(f_s, axis=-1))

        states, forces, ex = rollout(robot, z, controls,
                                     return_forces=False, extras_fn=extras)
        assert forces is None
        assert ex.shape == (B, n)
        states2, forces2, _ = rollout(robot, z, controls)
        got = np.asarray(jnp.std(jnp.linalg.norm(forces2[0], axis=-1), axis=-1))
        np.testing.assert_allclose(np.asarray(ex), got, atol=1e-4)

    def test_dphysics_wrapper_api(self, cfg):
        engine = DPhysics(cfg)
        n = cfg.n_sim_steps
        B = 3
        z = jnp.zeros((B,) + cfg.grid_shape)
        controls = jnp.tile(jnp.asarray([[0.4, 0.2]]), (B, n + 17, 1))  # over-long
        states, forces = engine(z, controls)
        assert states.x.shape == (B, n, 3)
        assert states.R.shape == (B, n, 3, 3)
        assert forces[0].shape[:2] == (B, n)


class TestGradients:
    def test_grad_through_rollout_matches_fd(self, cfg):
        """Finite-difference check of d(loss)/d(z_grid) through a short rollout."""
        robot = RobotModel.from_config(cfg)
        n = 20
        base = jnp.asarray(_gaussian_hill(cfg, height=0.2))
        controls = jnp.tile(jnp.asarray([[0.6, 0.0]]), (1, n, 1))

        def loss(z):
            states, _, _ = rollout(robot, z[None], controls)
            return jnp.mean(states.x[:, :, 2] ** 2)

        g = jax.grad(loss)(base)
        # check a handful of cells under the robot's path
        idx = [(64, 64), (70, 64), (64, 70)]
        eps = 1e-3
        for (i, j) in idx:
            zp = base.at[i, j].add(eps)
            zm = base.at[i, j].add(-eps)
            fd = (loss(zp) - loss(zm)) / (2 * eps)
            assert abs(float(g[i, j]) - float(fd)) < 5e-3 + 0.05 * abs(float(fd))

    def test_grad_wrt_friction_nonzero(self, cfg):
        robot = RobotModel.from_config(cfg)
        n = 30
        z = jnp.zeros((1,) + cfg.grid_shape)
        controls = jnp.tile(jnp.asarray([[0.8, 0.0]]), (1, n, 1))

        def loss(fr):
            states, _, _ = rollout(robot, z, controls, friction=fr[None])
            return states.x[0, -1, 0]

        g = jax.grad(loss)(jnp.ones(cfg.grid_shape))
        assert float(jnp.abs(g).sum()) > 0
        assert np.isfinite(np.asarray(g)).all()


class TestQuirksAndFuzz:
    def test_oob_flat_clamp_quirk_matches_oracle(self, cfg):
        """Queries outside the grid hit the reference's flat-index clamp
        (wrap across rows, dphysics.py:432-435) — exact path must reproduce
        it. Start the robot near the border so points go out of bounds."""
        n = 60
        rng = np.random.default_rng(3)
        z = rng.normal(scale=0.1, size=cfg.grid_shape).astype(np.float32)
        controls = np.tile(np.array([[1.0, 0.0]], np.float32), (n, 1))
        state0 = (np.array([6.1, 0.0, 0.0], np.float32),  # 0.3 m from edge
                  np.zeros(3, np.float32), np.eye(3, dtype=np.float32),
                  np.zeros(3, np.float32))
        states, _, ref = _run_both(cfg, z, controls, n, state0=state0)
        assert _rmse(states.x[0], ref["Xs"]) < 1e-3

    def test_fuzz_random_configs_vs_oracle(self):
        """Short rollouts across random stiffness/mass-scale/terrain/controls
        stay within the oracle parity gate."""
        rng = np.random.default_rng(11)
        for trial in range(3):
            cfg = PhysicsConfig(
                robot=["tradr", "husky"][trial % 2],
                stiffness=float(rng.uniform(20_000, 80_000)),
                traj_sim_time=0.5)
            n = cfg.n_sim_steps
            z = rng.normal(scale=0.12, size=cfg.grid_shape).astype(np.float32)
            controls = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
            states, _, ref = _run_both(cfg, z, controls, n)
            assert _rmse(states.x[0], ref["Xs"]) < 1e-3, (trial, cfg.robot)

    def test_tiny_contact_band_matches_unguarded_reference(self, cfg):
        """dh ~ 5-9 m above terrain: every sigmoid contact is tiny but
        NONZERO in f32 (exp(10*dh) overflows only past dh ~ 8.9 m), and the
        reference's unguarded division (dphysics.py:231-232) yields full
        clipped spring forces.  The engine's 0/0 guard must substitute the
        denominator ONLY at exactly zero — an eps clamp (the old
        max(n, 1e-20)) silently zeroed forces over this reachable band
        (predicted-terrain cliffs put airborne rollouts here)."""
        from monoforce_tpu.physics.engine import forward_kinematics

        robot = RobotModel.from_config(cfg)
        z = jnp.zeros(cfg.grid_shape, jnp.float32)
        mu = jnp.ones(cfg.grid_shape, jnp.float32)
        state = RigidState(
            x=jnp.array([0.0, 0.0, 6.0]), xd=jnp.zeros(3),
            R=jnp.eye(3), omega=jnp.zeros(3))
        (_, xdd, _), (F_s, _) = forward_kinematics(
            robot, z, mu, state, jnp.array([1.0, 0.0]), jnp.zeros(4))

        # reference math in f64: per-point spring scaled by contact/n_cp
        pts = np.asarray(robot.points, np.float64)
        dh = pts[:, 2] + 6.0
        contact = 1.0 / (1.0 + np.exp(10.0 * dh))
        assert contact.sum() > 0  # the band IS nonzero contact
        scale = -(float(robot.stiffness) * dh)          # vn = 0
        f_z = scale * contact / contact.sum()           # normal = +z
        mg = float(robot.mass) * float(robot.gravity)
        f_z = np.clip(f_z, -mg, mg)
        np.testing.assert_allclose(np.asarray(F_s[:, 2]), f_z, rtol=1e-3)
        assert abs(float(np.asarray(F_s[:, 2]).sum())) > 100.0  # not ~0

        # fully underflowed (dh > ~8.9 m): zero contact -> zero force, no NaN
        state10 = state._replace(x=jnp.array([0.0, 0.0, 10.0]))
        (_, xdd10, _), (F_s10, F_f10) = forward_kinematics(
            robot, z, mu, state10, jnp.array([1.0, 0.0]), jnp.zeros(4))
        assert np.isfinite(np.asarray(xdd10)).all()
        np.testing.assert_array_equal(np.asarray(F_s10), 0.0)
