from bayesdll_tpu.core.flat import flatten_params, path_masks
from bayesdll_tpu.core.prior import PriorSpec, FlatTarget
from bayesdll_tpu.core.schedule import CyclicalSchedule

__all__ = [
    "flatten_params",
    "path_masks",
    "PriorSpec",
    "FlatTarget",
    "CyclicalSchedule",
]
