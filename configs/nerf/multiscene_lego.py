_base_ = '../multiscene_default.py'

expname = 'multiscene_lego'
basedir = './logs/nerf_synthetic'

data = {
    'datadir': './data/nerf_synthetic/lego',
    'dataset_type': 'blender',
    'white_bkgd': True,
}
