from .rays import (
    get_ray_directions,
    get_rays,
    axisangle_to_R,
    normalize,
    average_poses,
    center_poses,
    create_spheric_poses,
    generate_interpolated_path,
)
from .intersect import ray_aabb_intersect, ray_sphere_intersect
from .morton import morton3d, morton3d_invert
