_base_ = '../default.py'

# Hermetic NDC smoke config: trains the DMPIGO (multiplane) model on the
# built-in forward-facing procedural fixture — the fixture-scale analogue of
# the LLFF recipe (configs/llff/llff_default.py; reference run equivalents
# in IMPROVING_LOG.md:119-132). Small enough for CPU CI.

expname = 'fixture_ndc_tiny'
basedir = './logs/synthetic'

data = {
    'datadir': None,
    'dataset_type': 'ndc_fixture',
    'ndc': True,
    'white_bkgd': False,
}

coarse_train = {'N_iters': 0}

fine_train = {
    'N_iters': 400,
    'N_rand': 1024,
    'ray_sampler': 'flatten',
    'lrate_density': 0.3,
    'lrate_k0': 0.3,
    'pg_scale': [],
    'tv_before': 1e9,
    'tv_dense_before': 200,
    'weight_tv_density': 1e-5,
    'weight_tv_k0': 1e-5,
}

fine_model_and_render = {
    'num_voxels': 48 * 48 * 48,
    'mpi_depth': 48,
    'rgbnet_dim': 0,
    'world_bound_scale': 1,
    'fast_color_thres': 1e-3,
    'stepsize': 1.0,
}
