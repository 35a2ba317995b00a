from monoforce_tpu.training.fit_terrain import fit_terrain, terrain_fit_step

__all__ = ["fit_terrain", "terrain_fit_step"]
