_base_ = './tri_default.py'

# Joint multi-scene conditioned defaults
# (reference configs/tri_multiscene_default.py).

data = {
    'multiscene': True,
    'multiscene_dataset': 'multiscene_blender',
    'test_scenes': [],
}

fine_train = {
    'weight_consistency': 0.0,
    'weight_cosine': 0.0,
    'weight_distillation': 0.0,
}

fine_model_and_render = {
    'mlp_map': True,
    'conv_map': False,
    'closed_map': False,
    'use_nl': False,
    'compute_consistency': False,
    'compute_cosine': False,
}
