from monoforce_tpu.models.terrain_encoder.lss import LiftSplatShoot

__all__ = ["LiftSplatShoot"]
