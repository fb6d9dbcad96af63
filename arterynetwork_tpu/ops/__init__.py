from .cc import connected_components, drop_small_components, label_volume
from .edt import edt, edt_squared
from .region_grow import RegionGrowResult, region_grow, region_grow_value_map
from .region_grow_frontier import region_grow_frontier
from .thinning import simple_point_mask, skeletonize
from .vesselness import (frangi_vesselness,
                         frangi_vesselness_chunked,
                         frangi_vesselness_streamed)
from .vesselness_fused import frangi_response_fused

__all__ = [
    "connected_components", "drop_small_components", "label_volume",
    "edt", "edt_squared",
    "RegionGrowResult", "region_grow", "region_grow_value_map",
    "region_grow_frontier",
    "simple_point_mask", "skeletonize",
    "frangi_vesselness", "frangi_vesselness_chunked",
    "frangi_vesselness_streamed", "frangi_response_fused",
]
