_base_ = '../default.py'

# Hermetic smoke config: trains on the built-in procedural fixture scene.
# Small enough to run end-to-end on CPU in a couple of minutes.

expname = 'fixture_tiny'
basedir = './logs/synthetic'

data = {
    'datadir': None,
    'dataset_type': 'synthetic_fixture',
    'white_bkgd': True,
}

coarse_train = {
    'N_iters': 300,
    'N_rand': 1024,
    # Short run: boost the grid lr so the coarse geometry crosses
    # mask_cache_thres within the budget (the reference's 5k-iter coarse
    # stage at lr 0.1 has 16x more steps to get there).
    'lrate_density': 0.3,
}

fine_train = {
    'N_iters': 300,
    'N_rand': 1024,
    'pg_scale': [150],
}

coarse_model_and_render = {
    'num_voxels': 24 ** 3,
    'num_voxels_base': 24 ** 3,
}

fine_model_and_render = {
    'num_voxels': 32 ** 3,
    'num_voxels_base': 32 ** 3,
    'rgbnet_dim': 6,
    'rgbnet_width': 32,
    'k_density': 64,
    'k_color': 32,
}
