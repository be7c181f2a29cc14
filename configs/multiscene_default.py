_base_ = './tri_default.py'

# Fully implicit conditioned model defaults
# (reference configs/multiscene_default.py).

fine_model_and_render = {
    'rgbnet_depth': 8,
    'rgbnet_width': 256,
    'skips': [2],
    'use_mipnerf_density': True,
    'posbase_pe': 10,
}
