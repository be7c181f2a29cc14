_base_ = './default.py'

# Super-resolution task defaults (reference configs/sr_default.py).

data = {
    'task': 'sr',
    'down': 4,
}

coarse_train = {
    'lrate_encoder': 1e-3,
}

fine_train = {
    'lrate_encoder': 1e-3,
}

fine_model_and_render = {
    'use_coarse_geo': False,
    'rgbnet_dim': 6,
    'rgbnet_direct': False,
}
