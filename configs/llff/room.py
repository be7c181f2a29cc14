_base_ = './llff_default.py'

expname = 'room'

data = {
    'datadir': './data/nerf_llff_data/room',
}
