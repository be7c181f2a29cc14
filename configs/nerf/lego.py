_base_ = '../default.py'

expname = 'dvgo_lego'
basedir = './logs/nerf_synthetic'

data = {
    'down': 1,
    'datadir': './data/nerf_synthetic/lego',
    'dataset_type': 'blender',
    'white_bkgd': True,
}

fine_model_and_render = {
    'use_coarse_geo': False,
}

fine_train = {
    'N_iters': 15000,
}
