"""Native (C++) runtime components: build + ctypes bindings."""

from .build import build_native, load_library
from .bindings import (twoview_depth_map_native, native_num_threads,
                       mvs_depth_maps_native, geodesic_weights_native)

__all__ = ["build_native", "load_library", "twoview_depth_map_native",
           "native_num_threads", "mvs_depth_maps_native",
           "geodesic_weights_native"]
