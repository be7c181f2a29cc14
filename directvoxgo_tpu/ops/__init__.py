from .grid import (
    trilinear_sample,
    occupancy_lookup,
    max_pool3d_same,
    resize_trilinear,
    world_to_grid,
)
from .raymarch import (
    ray_aabb_tminmax,
    sample_points_dense,
    sample_points_ndc,
    raw2alpha,
    alpha2weight_dense,
    compact_by_key,
)
from .tv import total_variation_add_grad
