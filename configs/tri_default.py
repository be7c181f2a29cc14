_base_ = './default.py'

# Triplane-conditioned task defaults (reference configs/tri_default.py).

data = {
    'task': 'sr',
    'down': 4,
    'multiscene': False,
    'render_down': 4,
}

coarse_train = {
    'lrate_encoder': 1e-3,
    'lrate_map': 1e-3,
    'lrate_interp_xy': 1e-3,
    'lrate_interp_yz': 1e-3,
    'lrate_interp_zx': 1e-3,
}

fine_train = {
    'lrate_encoder': 1e-3,
    'lrate_map': 1e-3,
    'lrate_interp_xy': 1e-3,
    'lrate_interp_yz': 1e-3,
    'lrate_interp_zx': 1e-3,
    'fixed_lr_idx': [],
    'dynamic_downsampling': False,
    'dynamic_down': 16,
}

coarse_model_and_render = {
    'cell_decode': False,
}

fine_model_and_render = {
    'use_coarse_geo': False,
    'global_cell_decode': False,
    'no_voxel_feat': False,
    'cat_posemb': True,
    'interp_width': 64,
    'interp_depth': 2,
    'map_depth': 1,
    'map_width': 64,
    'liif': False,
    'tri_aggregation': 'concat',
    'rgbnet_dim': 12,
    'cell_decode': False,
}
