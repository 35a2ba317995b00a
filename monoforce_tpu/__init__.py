"""MonoForce-TPU: a TPU-native (JAX/XLA/Pallas) learnable image-conditioned
physics engine for ground robots.

A ground-up re-design of the capabilities of ctu-vras/monoforce for TPU:

- ``monoforce_tpu.physics``  — differentiable rigid-body rollout on heightmaps
  (``lax.scan`` over time, ``vmap`` over trajectories) replacing the reference
  torch engine (reference: monoforce/src/monoforce/models/traj_predictor/dphysics.py).
- ``monoforce_tpu.models``   — Lift-Splat-Shoot terrain encoder in flax with a
  fixed-shape scatter-add splat (reference: .../terrain_encoder/lss.py).
- ``monoforce_tpu.ops``      — TPU kernels / XLA ops for the hot paths
  (heightmap gather, voxel pooling, heightmap rasterization).
- ``monoforce_tpu.planner``  — control shooting, path costs, selection and
  follower control law (reference: monoforce_ros + monoforce_navigation nodes).
- ``monoforce_tpu.training`` — trainers, losses, terrain fitting.
- ``monoforce_tpu.parallel`` — jax.sharding meshes and SPMD train/rollout steps.
"""

from monoforce_tpu.config import PhysicsConfig, LSSConfig

__version__ = "0.1.0"

__all__ = ["PhysicsConfig", "LSSConfig", "DPhysics", "LiftSplatShoot",
           "MonoForce", "Planner", "__version__"]


def __getattr__(name):
    # lazy top-level conveniences (keep `import monoforce_tpu` light — the
    # physics/model modules pull in jax/flax)
    if name == "DPhysics":
        from monoforce_tpu.physics import DPhysics
        return DPhysics
    if name == "LiftSplatShoot":
        from monoforce_tpu.models import LiftSplatShoot
        return LiftSplatShoot
    if name == "MonoForce":
        from monoforce_tpu.pipeline import MonoForce
        return MonoForce
    if name == "Planner":
        from monoforce_tpu.planner import Planner
        return Planner
    raise AttributeError(name)
