"""Filter suite — registry parity with filter_factory.cc:43-52."""
from .filters import (FILTER_REGISTRY, Filter, FilterChain, create_filter)
from .ground_removal2 import GroundRemoval2Filter
from .plane_detector import PlaneDetector, RandomSampleWithPlaneDetectFilter
from .range_image import RangeImageFilter

# the large pre-processors live in their own modules; register them
# alongside the filters.py registry entries
FILTER_REGISTRY.setdefault(GroundRemoval2Filter.NAME, GroundRemoval2Filter)
FILTER_REGISTRY.setdefault(RangeImageFilter.NAME, RangeImageFilter)
FILTER_REGISTRY.setdefault(RandomSampleWithPlaneDetectFilter.NAME,
                           RandomSampleWithPlaneDetectFilter)

__all__ = ["FILTER_REGISTRY", "Filter", "FilterChain", "create_filter",
           "GroundRemoval2Filter", "RangeImageFilter", "PlaneDetector",
           "RandomSampleWithPlaneDetectFilter"]
