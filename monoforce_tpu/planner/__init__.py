from monoforce_tpu.planner.shooting import (
    Planner,
    force_variance_cost,
    inclination_cost,
    select_path,
    normalize_costs,
)
from monoforce_tpu.planner.follower import follower_step, FollowerParams

__all__ = [
    "Planner",
    "force_variance_cost",
    "inclination_cost",
    "select_path",
    "normalize_costs",
    "follower_step",
    "FollowerParams",
]
