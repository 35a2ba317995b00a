from monoforce_tpu.training.fit_terrain import fit_terrain, terrain_fit_step
from monoforce_tpu.training.trainer import Trainer, make_train_step, avg_pool_grid

__all__ = ["fit_terrain", "terrain_fit_step", "Trainer", "make_train_step",
           "avg_pool_grid"]
