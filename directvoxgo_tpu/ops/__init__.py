from .grid import (
    trilinear_sample,
    trilinear_sample_parts,
    trilinear_sample_world,
    occupancy_lookup,
    occupancy_lookup_parts,
    max_pool3d_same,
    resize_trilinear,
    world_to_grid,
    world_to_grid_parts,
)
from .raymarch import (
    ray_aabb_tminmax,
    ray_aabb_tminmax_parts,
    sample_points_dense,
    sample_points_dense_parts,
    sample_points_ndc,
    raw2alpha,
    alpha2weight_dense,
    compact_by_key,
)
from .tv import total_variation_add_grad
