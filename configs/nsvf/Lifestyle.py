_base_ = '../default.py'

expname = 'dvgo_Lifestyle'
basedir = './logs/nsvf_synthetic'

data = {
    'down': 1,
    'datadir': './data/Synthetic_NSVF/Lifestyle',
    'dataset_type': 'nsvf',
    'inverse_y': True,
    'white_bkgd': True,
}

coarse_train = {'N_iters': 0}

fine_model_and_render = {'use_coarse_geo': False}

fine_train = {'N_iters': 10000}
