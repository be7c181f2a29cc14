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
    # Trains the shared distillation projection head when use_anchor_liif
    # (reference configs/tri_multiscene_default.py:70).
    'lrate_distillation_head': 1e-4,
}

fine_model_and_render = {
    'mlp_map': True,
    'conv_map': False,
    'closed_map': False,
    'use_nl': False,
    'compute_consistency': False,
    'compute_cosine': False,
    # Anchor-LIIF distillation teacher (reference :153-154, :178): a frozen
    # Interp_MLP loaded from the pretrained LIIF checkpoint; weight the loss
    # with fine_train.weight_distillation.
    'use_anchor_liif': False,
    'load_liif_sd': False,
    'liif_state_dict': '',
}
