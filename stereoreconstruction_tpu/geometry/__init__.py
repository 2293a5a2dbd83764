from .rays import (
    closest_points,
    ray_ray_distance,
    ray_midpoint,
    intersect_plane,
    refract_ray,
)
from .plane import Plane
from .camera import (
    Camera,
    make_camera,
    camera_from_P,
    project,
    unproject,
    principal_ray,
    from_global_to_local,
    from_local_to_global,
)
from .quartic import refraction_radius

__all__ = [
    "closest_points",
    "ray_ray_distance",
    "ray_midpoint",
    "intersect_plane",
    "refract_ray",
    "Plane",
    "Camera",
    "make_camera",
    "camera_from_P",
    "project",
    "unproject",
    "principal_ray",
    "from_global_to_local",
    "from_local_to_global",
    "refraction_radius",
]
