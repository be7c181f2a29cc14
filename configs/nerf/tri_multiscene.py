_base_ = '../tri_multiscene_default.py'

expname = 'tri_multiscene_nerf'
basedir = './logs/nerf_synthetic'

data = {
    'datadir': './data/nerf_synthetic',
    'dataset_type': 'blender',
    'white_bkgd': True,
    'test_scenes': ['ship'],
}
