_base_ = '../sr_default.py'

expname = 'sr_lego'
basedir = './logs/nerf_synthetic'

data = {
    'datadir': './data/nerf_synthetic/lego',
    'dataset_type': 'blender',
    'white_bkgd': True,
}
