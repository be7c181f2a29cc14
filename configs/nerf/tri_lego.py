_base_ = '../tri_default.py'

expname = 'tri_lego'
basedir = './logs/nerf_synthetic'

data = {
    'datadir': './data/nerf_synthetic/lego',
    'dataset_type': 'blender',
    'white_bkgd': True,
}
