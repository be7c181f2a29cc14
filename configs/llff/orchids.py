_base_ = './llff_default.py'

expname = 'orchids'

data = {
    'datadir': './data/nerf_llff_data/orchids',
}
