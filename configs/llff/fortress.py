_base_ = './llff_default.py'

expname = 'fortress'

data = {
    'datadir': './data/nerf_llff_data/fortress',
}
