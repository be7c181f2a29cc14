# Fern-scale NDC e2e measurement config: the exact LLFF training recipe
# (configs/llff/llff_default.py = the reference's llff defaults — 25k fine
# iters, 4096-ray batches, 256^3 voxels at mpi_depth 128, pg at
# [2k,4k,6k,8k]) on the hermetic forward-facing procedural fixture at
# fern's 756x1008 resolution and view count (fern: 20 images, 17 train /
# 3 held out). Proves the LLFF-shaped wall-clock end-to-end with no
# external data (reference bar: ~5.5 min/scene, IMPROVING_LOG.md:119-132;
# render 0.36 s class, README.md:17).
_base_ = '../default.py'

expname = 'fixture_ndc_fern'
basedir = './logs/synthetic'

data = {
    'datadir': None,
    'dataset_type': 'ndc_fixture',
    'ndc': True,
    'white_bkgd': False,
    'fixture_kwargs': {
        'H': 756, 'W': 1008,
        'n_train': 17, 'n_val': 1, 'n_test': 3,
        'teacher_res': 128,
    },
}

coarse_train = {'N_iters': 0}

fine_train = {
    'N_iters': 25000,
    'N_rand': 4096,
    'pg_scale': [2000, 4000, 6000, 8000],
    'ray_sampler': 'flatten',
    'tv_before': 1e9,
    'tv_dense_before': 10000,
    'weight_tv_density': 1e-5,
    'weight_tv_k0': 1e-5,
}

fine_model_and_render = {
    'num_voxels': 256 ** 3,
    'mpi_depth': 128,
    'rgbnet_dim': 9,
    'rgbnet_width': 64,
    'world_bound_scale': 1,
    'fast_color_thres': 1e-3,
    'sweep_color_topk': 64,
}
