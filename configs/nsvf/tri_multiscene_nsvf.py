_base_ = '../tri_multiscene_default.py'

expname = 'tri_multiscene_nsvf'
basedir = './logs/nsvf_synthetic'

data = {
    'datadir': './data/Synthetic_NSVF',
    'dataset_type': 'nsvf',
    'multiscene_dataset': 'multiscene_nsvf',
    'inverse_y': True,
    'white_bkgd': True,
    'test_scenes': ['Wineholder'],
}
