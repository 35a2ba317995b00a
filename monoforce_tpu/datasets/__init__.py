from monoforce_tpu.datasets.rough import ROUGH, rough_seq_dirs, estimate_heightmap_np
from monoforce_tpu.datasets.wildscenes import METAINFO as WILDSCENES_METAINFO
from monoforce_tpu.datasets.coco import COCO_CATEGORIES

__all__ = [
    "ROUGH", "rough_seq_dirs", "estimate_heightmap_np",
    "WILDSCENES_METAINFO", "COCO_CATEGORIES",
]
