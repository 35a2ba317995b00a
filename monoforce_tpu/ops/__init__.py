from monoforce_tpu.ops.voxel_pool import voxel_pool
from monoforce_tpu.ops.heightmap import estimate_heightmap, hm_to_cloud, filter_grid

__all__ = ["voxel_pool", "estimate_heightmap", "hm_to_cloud", "filter_grid"]
