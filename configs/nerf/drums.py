_base_ = '../default.py'

expname = 'dvgo_drums'
basedir = './logs/nerf_synthetic'

data = {
    'down': 4,
    'datadir': './data/nerf_synthetic/drums',
    'dataset_type': 'blender',
    'white_bkgd': True,
}

coarse_train = {'N_iters': 0}

fine_model_and_render = {'use_coarse_geo': False}

fine_train = {'N_iters': 10000}
