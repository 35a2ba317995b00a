"""Differentiable rigid-body terrain rollout — the TPU-native heart of the
framework.

Functional re-design of the reference torch engine (reference:
monoforce/src/monoforce/models/traj_predictor/dphysics.py):

- the per-step physics (``forward_kinematics``) is a pure function of
  (robot, terrain, state, control, joint_angles) for a SINGLE trajectory,
- time integration is a ``jax.lax.scan``.  The reference has TWO integrators
  and both are golden-gated here: ``dynamics()`` (semi-implicit euler,
  dphysics.py:467-497 -> ``rollout``) and its actual DEFAULT
  ``dynamics_odeint`` (``use_odeint=True``, dphys_config.py:153 ->
  torchdiffeq fixed-grid explicit euler over the extended state,
  dphysics.py:499-528 -> ``rollout_odeint``),
- trajectory batching is ``jax.vmap`` over the scan — this is the north-star
  parallel axis (thousands of sampled control sequences per planning step),
- data parallelism over devices composes on top via ``jax.sharding``
  (see monoforce_tpu.parallel).

Reference quirks replicated on purpose (they are part of the spec):
- soft contact ``sigmoid(-10 * dh)`` (dphysics.py:223),
- per-contact normalization by the *soft* contact count and elementwise force
  clamping to +-m*g (dphysics.py:231-233, 251),
- angular ACCELERATION clamped to +-omega_max (dphysics.py:257),
- semi-implicit Euler: velocity first, position with the new velocity
  (dphysics.py:281-284), Rodrigues rotation update with the new omega,
- initial settle of the body to the mean terrain height under its points
  (dphysics.py:566-571),
- post-hoc equilibrium offset ``X += R_z * m*g/k`` (dphysics.py:586-589),
- the 'rk4' integration mode reproduces the reference formula verbatim
  (dphysics.py:375-380), which treats the derivative as self-incrementing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from monoforce_tpu.physics.terrain import interpolate_grid, normalized
from monoforce_tpu.physics.controls import vw_to_track_vels

__all__ = [
    "RigidState",
    "RobotModel",
    "DPhysics",
    "rollout",
    "rollout_single",
    "rollout_odeint",
    "rollout_single_odeint",
    "inertia_tensor",
    "integrate_rotation",
    "forward_kinematics",
]

_HI = lax.Precision.HIGHEST


class RigidState(NamedTuple):
    """State of the rigid body: position, velocity, rotation, angular rate."""

    x: jax.Array      # (..., 3)
    xd: jax.Array     # (..., 3)
    R: jax.Array      # (..., 3, 3)
    omega: jax.Array  # (..., 3)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "points", "driving_masks", "mass", "inertia_inv", "joint_positions",
        "robot_size", "gravity", "gravity_direction", "stiffness", "damping",
        "omega_max", "d_max", "grid_res", "dt",
    ],
    meta_fields=["n_tracks", "has_flippers", "integration_mode"],
)
@dataclasses.dataclass(frozen=True)
class RobotModel:
    """Device-side robot + terrain-interaction parameters.

    Array/scalar leaves are pytree data (no recompilation when values change);
    ``n_tracks`` / ``has_flippers`` / ``integration_mode`` are static metadata
    that select the traced program.
    """

    points: jax.Array            # (P, 3) body-frame contact points
    driving_masks: jax.Array     # (K, P) f32 0/1 — disjoint driving parts
    mass: jax.Array              # ()
    inertia_inv: jax.Array       # (3, 3) inverse inertia of the base points
    joint_positions: jax.Array   # (4, 3) flipper joint positions (marv)
    robot_size: jax.Array        # (2,) (s_x, s_y)
    gravity: jax.Array           # () 9.81
    gravity_direction: jax.Array  # (3,)
    stiffness: jax.Array         # () N/m
    damping: jax.Array           # () N s/m
    omega_max: jax.Array         # () clamp for angular acceleration
    d_max: jax.Array             # () heightmap half-extent
    grid_res: jax.Array          # () heightmap cell size
    dt: jax.Array                # () integration step
    n_tracks: int = 2
    has_flippers: bool = False
    integration_mode: str = "euler"

    @classmethod
    def from_config(cls, cfg) -> "RobotModel":
        pts = jnp.asarray(cfg.robot_points, dtype=jnp.float32)
        inertia = inertia_tensor(cfg.robot_mass, pts)
        return cls(
            points=pts,
            driving_masks=jnp.asarray(cfg.driving_parts, dtype=jnp.float32),
            mass=jnp.float32(cfg.robot_mass),
            inertia_inv=jnp.linalg.inv(inertia),
            joint_positions=jnp.asarray(
                [cfg.joint_positions[k] for k in ("fl", "fr", "rl", "rr")],
                dtype=jnp.float32),
            robot_size=jnp.asarray(cfg.robot_size, dtype=jnp.float32),
            gravity=jnp.float32(cfg.gravity),
            gravity_direction=jnp.asarray(cfg.gravity_direction, dtype=jnp.float32),
            stiffness=jnp.float32(cfg.stiffness),
            damping=jnp.float32(cfg.damping),
            omega_max=jnp.float32(cfg.omega_max),
            d_max=jnp.float32(cfg.d_max),
            grid_res=jnp.float32(cfg.grid_res),
            dt=jnp.float32(cfg.dt),
            n_tracks=int(cfg.driving_parts.shape[0]),
            has_flippers=("marv" in cfg.robot),
            integration_mode=cfg.integration_mode,
        )


def inertia_tensor(mass, points):
    """Inertia tensor of equal point masses (reference: dphysics.py:107-141).

    points: (P, 3) -> (3, 3).
    """
    points = jnp.asarray(points)
    m_pt = mass / points.shape[0]
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    ixx = jnp.sum(m_pt * (y ** 2 + z ** 2))
    iyy = jnp.sum(m_pt * (x ** 2 + z ** 2))
    izz = jnp.sum(m_pt * (x ** 2 + y ** 2))
    ixy = -jnp.sum(m_pt * x * y)
    ixz = -jnp.sum(m_pt * x * z)
    iyz = -jnp.sum(m_pt * y * z)
    return jnp.array([[ixx, ixy, ixz],
                      [ixy, iyy, iyz],
                      [ixz, iyz, izz]])


def skew(v):
    """Skew-symmetric matrix of a 3-vector."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ], axis=-2)


def integrate_rotation(R, omega, dt, eps: float = 1e-6):
    """Rodrigues update R <- R expm([omega]_x dt) (reference: dphysics.py:290-324)."""
    omega_x = skew(omega)
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)[..., None]
    omega_n = omega_x / jnp.clip(theta, min=eps)
    eye = jnp.eye(3, dtype=R.dtype)
    rot = (eye
           + omega_n * jnp.sin(theta * dt)
           + jnp.matmul(omega_n, omega_n, precision=_HI) * (1.0 - jnp.cos(theta * dt)))
    return jnp.matmul(R, rot, precision=_HI)


def integration_step(x, xd, dt, mode: str = "euler"):
    """Explicit integration step (reference: dphysics.py:360-383)."""
    if mode == "euler":
        return x + xd * dt
    if mode == "rk4":
        # Reference formula replicated verbatim (dphysics.py:375-380).
        k1 = dt * xd
        k2 = dt * (xd + k1 / 2)
        k3 = dt * (xd + k2 / 2)
        k4 = dt * (xd + k3)
        return x + (k1 + 2 * k2 + 2 * k3 + k4) / 6
    raise ValueError(f"Unknown integration mode: {mode}")


def update_joints(robot: RobotModel, joint_angles):
    """Rotate flipper point groups about the y-axis at their joint positions
    (reference: dphysics.py:326-358).  joint_angles: (4,) -> points (P, 3).

    Applying a zero-angle rotation is numerically exact, so unlike the
    reference we need no dynamic all-zeros short-circuit.
    """
    pts = robot.points
    if not robot.has_flippers:
        return pts
    for i in range(4):
        a = joint_angles[i]
        c, s = jnp.cos(a), jnp.sin(a)
        zero, one = jnp.zeros_like(a), jnp.ones_like(a)
        rot = jnp.stack([c, zero, s, zero, one, zero, -s, zero, c]).reshape(3, 3)
        jp = robot.joint_positions[i]
        rotated = jnp.matmul(pts - jp, rot.T, precision=_HI) + jp
        mask = robot.driving_masks[i][:, None]
        pts = mask * rotated + (1.0 - mask) * pts
    return pts


def forward_kinematics(robot: RobotModel, z_grid, friction,
                       state: RigidState, control, joint_angles):
    """Net forces / state derivative for one trajectory at one instant
    (reference: dphysics.py:172-272).

    Args:
      z_grid, friction: (H, W) terrain grids for this trajectory.
      state: RigidState with unbatched leaves (3,), (3,3).
      control: (2,) commanded (v, w).
      joint_angles: (4,) flipper angles.

    Returns ((xd, xdd, omega_d), (F_spring, F_friction)).
    """
    x, xd, R, omega = state
    m, g = robot.mass, robot.gravity

    # body points for this step (+ inertia if the geometry is articulated)
    if robot.has_flippers:
        pts_body = update_joints(robot, joint_angles)
        inertia_inv = jnp.linalg.inv(inertia_tensor(m, pts_body))
    else:
        pts_body = robot.points
        inertia_inv = robot.inertia_inv

    # world-frame points and their velocities (Koenig)
    pts = jnp.matmul(pts_body, R.T, precision=_HI) + x
    r = pts - x
    xd_pts = xd + jnp.cross(omega[None, :], r)

    # terrain lookup
    z, n = interpolate_grid(z_grid, pts[:, 0], pts[:, 1],
                            robot.d_max, robot.grid_res, return_normals=True)
    mu = interpolate_grid(friction, pts[:, 0], pts[:, 1],
                          robot.d_max, robot.grid_res)

    # soft contact + spring-damper reaction (dphysics.py:220-234)
    dh = pts[:, 2] - z
    in_contact = jax.nn.sigmoid(-10.0 * dh)
    vn = jnp.sum(xd_pts * n, axis=-1)
    f_spring = -(robot.stiffness * dh + robot.damping * vn)[:, None] * n
    n_contacts = jnp.sum(in_contact)
    # the reference divides unguarded (dphysics.py:231-232): when the body
    # sits > ~8.9 m above the terrain, sigmoid underflows to exactly 0 for
    # every point and the reference NaNs (then crashes on the NaN loss,
    # train.py:161-163).  Garbage early-training terrain predictions reach
    # that regime.  The guard substitutes the denominator ONLY at exactly
    # zero (0/1 = 0: no contact -> no force); any nonzero sum — f32 contact
    # sums stay >= ~1e-38 down to dh ~ 8.9 m — divides bit-exactly like the
    # reference (an earlier max(n, 1e-20) clamp zeroed forces over the
    # reachable 5-9 m band).
    f_spring = (f_spring * in_contact[:, None]
                / jnp.where(n_contacts > 0, n_contacts, 1.0))
    f_spring = jnp.clip(f_spring, -m * g, m * g)

    # velocity-based Coulomb-style friction (dphysics.py:236-252)
    thrust_dir = normalized(R[:, 0])
    normal_mag = jnp.linalg.norm(f_spring, axis=-1)
    track_vels = vw_to_track_vels(control[0], control[1],
                                  robot.robot_size, robot.n_tracks)
    cmd_scale = jnp.matmul(robot.driving_masks.T, track_vels, precision=_HI)  # (P,)
    cmd_vels = cmd_scale[:, None] * thrust_dir[None, :]
    slip = mu[:, None] * (cmd_vels - xd_pts)
    slip_n = jnp.sum(slip * n, axis=-1, keepdims=True) * n
    slip_tau = slip - slip_n
    f_friction = normal_mag[:, None] * slip_tau
    f_friction = jnp.clip(f_friction, -m * g, m * g)

    # torques and accelerations (dphysics.py:254-267)
    torque = jnp.sum(jnp.cross(r, f_spring + f_friction), axis=0)
    omega_d = jnp.matmul(inertia_inv, torque, precision=_HI)
    omega_d = jnp.clip(omega_d, -robot.omega_max, robot.omega_max)
    f_total = (m * g * robot.gravity_direction
               + jnp.sum(f_spring, axis=0) + jnp.sum(f_friction, axis=0))
    xdd = f_total / m

    return (xd, xdd, omega_d), (f_spring, f_friction)


def _update_state(robot: RobotModel, state: RigidState, dstate) -> RigidState:
    """Semi-implicit integration step (reference: dphysics.py:274-288)."""
    _, xdd, omega_d = dstate
    mode, dt = robot.integration_mode, robot.dt
    xd = integration_step(state.xd, xdd, dt, mode)
    x = integration_step(state.x, xd, dt, mode)          # uses the NEW velocity
    omega = integration_step(state.omega, omega_d, dt, mode)
    R = integrate_rotation(state.R, omega, dt)           # uses the NEW omega
    return RigidState(x, xd, R, omega)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _identity_clip_grad(limit: float, x):
    """Identity in the forward pass; clips the cotangent elementwise in the
    backward pass.  Applied to the scan carry to keep BPTT through the stiff
    contact dynamics from overflowing f32 (the reference instead crashes on
    NaN losses, train.py:161-163)."""
    return x


def _icg_fwd(limit, x):
    return x, None


def _icg_bwd(limit, _, g):
    return (jax.tree.map(lambda t: jnp.clip(t, -limit, limit), g),)


_identity_clip_grad.defvjp(_icg_fwd, _icg_bwd)


def rollout_single(robot: RobotModel, z_grid, friction, controls, joint_angles,
                   state0: RigidState, return_forces: bool = True,
                   extras_fn: Optional[Callable] = None,
                   bptt_grad_clip: Optional[float] = None,
                   remat_segment: Optional[int] = None):
    """Roll one trajectory for N = controls.shape[0] steps.

    Matches the reference `dphysics()` driver (dphysics.py:530-594): settle,
    scan, equilibrium offset.  States are recorded AFTER each update, forces
    at the pre-update state (reference dynamics(), dphysics.py:467-497).

    ``remat_segment=K`` wraps every K consecutive steps in ``jax.checkpoint``:
    BPTT then stores only the segment-boundary states and recomputes the
    in-segment activations in the backward pass — O(N/K + K) live memory
    instead of O(N).  This is the principled long-horizon replacement for the
    reference's plain O(N) BPTT (dphysics.py:490-496), which simply OOMs on
    long horizons.  Values and gradients match the unremat scan to ~1 ulp
    (compiler fusion reassociation only).

    Returns (states: RigidState stacked over time, forces | None, extras | None).
    """
    # settle: place the body at the mean terrain height under its points
    pts0 = jnp.matmul(robot.points, state0.R.T, precision=_HI) + state0.x
    z0 = interpolate_grid(z_grid, pts0[:, 0], pts0[:, 1],
                          robot.d_max, robot.grid_res).mean()
    state0 = state0._replace(x=state0.x.at[2].set(z0))

    def step(state, inp):
        control, joints = inp
        if bptt_grad_clip is not None:
            state = _identity_clip_grad(bptt_grad_clip, state)
        dstate, forces = forward_kinematics(robot, z_grid, friction,
                                            state, control, joints)
        new_state = _update_state(robot, state, dstate)
        out = [new_state]
        if return_forces:
            out.append(forces)
        if extras_fn is not None:
            out.append(extras_fn(new_state, forces))
        return new_state, tuple(out)

    if remat_segment is not None and remat_segment > 1:
        K = int(remat_segment)
        n = controls.shape[0]
        if n % K != 0:
            raise ValueError(
                f"remat_segment={K} must divide the horizon N={n}")

        @functools.partial(jax.checkpoint, prevent_cse=False)
        def segment(state, seg_inp):
            return lax.scan(step, state, seg_inp)

        seg_inp = jax.tree.map(
            lambda a: a.reshape((n // K, K) + a.shape[1:]),
            (controls, joint_angles))
        _, outs = lax.scan(segment, state0, seg_inp)
        outs = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), outs)
    else:
        _, outs = lax.scan(step, state0, (controls, joint_angles))
    states = outs[0]
    idx = 1
    forces = None
    if return_forces:
        forces = outs[idx]
        idx += 1
    extras = outs[idx] if extras_fn is not None else None

    # equilibrium sink-in compensation along the body z-axis
    delta_h = robot.mass * robot.gravity / (robot.stiffness + 1e-6)
    states = states._replace(x=states.x + states.R[:, :, 2] * delta_h)
    return states, forces, extras


def rollout_single_odeint(robot: RobotModel, z_grid, friction, controls,
                          joint_angles, state0: RigidState, dt=None):
    """Roll ONE trajectory with the reference's DEFAULT integrator semantics
    (``use_odeint=True``, dphys_config.py:153): ``torchdiffeq.odeint(
    method='euler')`` over ``forward_kinematics_extended_state``
    (dphysics.py:499-528, 191-196) — FULLY-explicit euler, unlike
    ``rollout_single``'s semi-implicit ``update_state`` (dphysics.py:274-288).

    Reference quirks replicated on purpose:
    - output row 0 is the INITIAL (settled) state; N-1 integration steps
      produce rows 1..N-1 (odeint returns the state at every ``ts`` entry),
    - the effective step is ``ts[k+1]-ts[k]`` from ``linspace(0, T,
      int(T/dt))`` (dphysics.py:167) — i.e. ``T/(int(T/dt)-1)``, NOT
      ``cfg.dt``; pass it via ``dt`` (defaults to ``robot.dt`` if None),
    - the rotation integrates LINEARLY, ``R += dt * [omega]_x R``
      (the extended-state derivative includes dR; no Rodrigues
      re-orthonormalization, so R drifts off SO(3)),
    - the force slots of the extended state are INTEGRATED from zero:
      ``F_out[k] = sum_{j<k} dt * F(t_j)`` — the "forces" this path returns
      are running time-integrals (impulses), not instantaneous forces,
    - the control/joint lookup at grid time ``ts[k]`` resolves to index k
      (``argmin |t - ts|``, dphysics.py:183).

    Returns (states stacked over N rows, (F_spring_int, F_friction_int)).
    """
    if dt is None:
        dt = robot.dt
    # settle: place the body at the mean terrain height under its points
    pts0 = jnp.matmul(robot.points, state0.R.T, precision=_HI) + state0.x
    z0 = interpolate_grid(z_grid, pts0[:, 0], pts0[:, 1],
                          robot.d_max, robot.grid_res).mean()
    state0 = state0._replace(x=state0.x.at[2].set(z0))

    P = robot.points.shape[0]
    f_zero = jnp.zeros((P, 3), dtype=state0.x.dtype)
    y0 = (state0.x, state0.xd, state0.R, state0.omega, f_zero, f_zero)

    def step(y, inp):
        control, joints = inp
        x, xd, R, omega, fs_acc, ff_acc = y
        state = RigidState(x, xd, R, omega)
        (dx, xdd, omega_d), (f_spring, f_friction) = forward_kinematics(
            robot, z_grid, friction, state, control, joints)
        dR = jnp.matmul(skew(omega), R, precision=_HI)
        y_new = (x + dt * dx, xd + dt * xdd, R + dt * dR,
                 omega + dt * omega_d,
                 fs_acc + dt * f_spring, ff_acc + dt * f_friction)
        return y_new, y_new

    # N-1 explicit steps; row 0 of the output is y0 itself.
    _, ys = lax.scan(step, y0, (controls[:-1], joint_angles[:-1]))
    out = jax.tree.map(lambda a0, a: jnp.concatenate([a0[None], a]), y0, ys)
    states = RigidState(out[0], out[1], out[2], out[3])
    forces = (out[4], out[5])

    # equilibrium sink-in compensation (dphysics.py:586-589) — applied to all
    # rows including the initial one
    delta_h = robot.mass * robot.gravity / (robot.stiffness + 1e-6)
    states = states._replace(x=states.x + states.R[:, :, 2] * delta_h)
    return states, forces


@jax.jit
def rollout_odeint(robot: RobotModel, z_grid, controls, joint_angles=None,
                   state0: Optional[RigidState] = None, friction=None,
                   dt=None):
    """Batched rollout with the reference's DEFAULT odeint-euler integrator
    (see ``rollout_single_odeint``).  Same call surface as ``rollout``; the
    linspace-accurate step ``T/(int(T/dt)-1)`` should be passed as ``dt``
    (``DPhysics`` does this when ``cfg.use_odeint`` is set).

    Returns (states with (B, N, ...) leaves, (F_spring_int, F_friction_int)).
    """
    z_grid = jnp.asarray(z_grid, dtype=jnp.float32)
    controls = jnp.asarray(controls, dtype=jnp.float32)
    B, N = controls.shape[0], controls.shape[1]
    if joint_angles is None:
        joint_angles = jnp.zeros((B, N, 4), dtype=jnp.float32)
    if friction is None:
        friction = jnp.ones_like(z_grid)
    if state0 is None:
        state0 = _default_state0(controls)
    if dt is None:
        dt = robot.dt
    fn = functools.partial(rollout_single_odeint, robot, dt=dt)
    return jax.vmap(fn)(z_grid, friction, controls, joint_angles, state0)


def auto_remat_segment(n: int, threshold: int = 64) -> Optional[int]:
    """Pick a remat segment length for an N-step BPTT horizon: the divisor of
    N closest to sqrt(N) (minimizing stored-boundaries + recompute-window
    memory).  Returns None for short horizons where remat only adds
    recompute."""
    if n < threshold:
        return None
    target = max(1, int(round(n ** 0.5)))
    divisors = [k for k in range(2, n) if n % k == 0]
    if not divisors:
        return None
    return min(divisors, key=lambda k: abs(k - target))


def _default_state0(controls) -> RigidState:
    """Reference default initial state (dphysics.py:554-559): at the origin,
    moving with the first commanded (v, w)."""
    B = controls.shape[0]
    x = jnp.zeros((B, 3), dtype=controls.dtype)
    xd = jnp.zeros((B, 3), dtype=controls.dtype).at[:, 0].set(controls[:, 0, 0])
    R = jnp.broadcast_to(jnp.eye(3, dtype=controls.dtype), (B, 3, 3))
    omega = jnp.zeros((B, 3), dtype=controls.dtype).at[:, 2].set(controls[:, 0, 1])
    return RigidState(x, xd, R, omega)


@functools.partial(jax.jit, static_argnames=("return_forces", "extras_fn",
                                              "bptt_grad_clip",
                                              "remat_segment"))
def rollout(robot: RobotModel, z_grid, controls, joint_angles=None,
            state0: Optional[RigidState] = None, friction=None,
            return_forces: bool = True, extras_fn: Optional[Callable] = None,
            bptt_grad_clip: Optional[float] = None,
            remat_segment: Optional[int] = None):
    """Batched differentiable rollout (the reference ``DPhysics.forward``).

    Args:
      robot: RobotModel pytree (shared across the batch).
      z_grid: (B, H, W) heightmaps (one per trajectory; broadcast upstream to
        share a single map across a shooting batch).
      controls: (B, N, 2) commanded (v, w) per step.
      joint_angles: (B, N, 4) flipper angles; zeros if None.
      state0: RigidState with (B, ...) leaves; reference default if None.
      friction: (B, H, W) friction grids; ones if None.
      return_forces: stack per-step (F_spring, F_friction) — O(B*N*P*3) memory;
        switch off for large shooting batches and use ``extras_fn`` instead.
      extras_fn: optional per-step reduction ``f(state, (F_s, F_f)) -> pytree``
        evaluated inside the scan (e.g. running cost statistics).

    Returns (states: RigidState with (B, N, ...) leaves, forces, extras).
    """
    z_grid = jnp.asarray(z_grid, dtype=jnp.float32)
    controls = jnp.asarray(controls, dtype=jnp.float32)
    B, N = controls.shape[0], controls.shape[1]
    if joint_angles is None:
        joint_angles = jnp.zeros((B, N, 4), dtype=jnp.float32)
    if friction is None:
        friction = jnp.ones_like(z_grid)
    if state0 is None:
        state0 = _default_state0(controls)

    fn = functools.partial(rollout_single, robot,
                           return_forces=return_forces, extras_fn=extras_fn,
                           bptt_grad_clip=bptt_grad_clip,
                           remat_segment=remat_segment)
    return jax.vmap(fn)(z_grid, friction, controls, joint_angles, state0)


class DPhysics:
    """Convenience wrapper with the reference call signature
    (reference: dphysics.py:596-605).

    >>> engine = DPhysics(PhysicsConfig(robot="tradr"))
    >>> states, forces = engine(z_grid, controls)
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.robot = RobotModel.from_config(cfg)

    def __call__(self, z_grid, controls, joint_angles=None, state=None,
                 friction=None, return_forces: bool = True, extras_fn=None):
        n_ts = min(self.cfg.n_sim_steps, controls.shape[1])
        controls = controls[:, :n_ts]
        if joint_angles is not None:
            joint_angles = joint_angles[:, :n_ts]
        state0 = RigidState(*state) if state is not None else None
        if getattr(self.cfg, "use_odeint", False):
            # Reference-default integrator (dphys_config.py:153).  Effective
            # step from the linspace ts grid (dphysics.py:167): the grid has
            # int(T/dt) points over [0, T], truncation keeps the spacing.
            # The odeint path carries forces INSIDE the extended state
            # (dphysics.py:499-528), so its `forces` are time-INTEGRATED
            # impulses — not the instantaneous forces of the euler branch —
            # and per-step extras cannot be tapped; fail loudly instead of
            # silently changing the return contract.
            if extras_fn is not None:
                raise ValueError(
                    "extras_fn is not supported with use_odeint=True: the "
                    "reference's odeint integrator exposes no per-step tap "
                    "(dphysics.py:499-528); set cfg.use_odeint=False")
            n_full = self.cfg.n_sim_steps
            dt_eff = self.cfg.traj_sim_time / max(n_full - 1, 1)
            states, forces = rollout_odeint(
                self.robot, z_grid, controls, joint_angles=joint_angles,
                state0=state0, friction=friction, dt=dt_eff)
            if not return_forces:
                return states, None
            return states, forces
        states, forces, extras = rollout(
            self.robot, z_grid, controls, joint_angles=joint_angles,
            state0=state0, friction=friction,
            return_forces=return_forces, extras_fn=extras_fn)
        if extras_fn is not None:
            return states, forces, extras
        return states, forces
