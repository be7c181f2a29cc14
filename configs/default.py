# Canonical config schema for directvoxgo_tpu.
# Field names and default values follow the reference schema
# (reference configs/default.py) because configs in the wild depend on the
# `lrate_<param>` convention and these exact knobs; TPU-specific additions are
# marked below.

expname = None          # experiment name
basedir = './logs/'     # where checkpoints and logs are written

# ---------------------------------------------------------------- data
data = {
    'task': '',
    'down': 1,
    'datadir': None,            # dataset root
    'dataset_type': None,       # blender|nsvf|blendedmvs|tankstemple|deepvoxels|co3d|llff|synthetic_fixture
    'inverse_y': False,         # intrinsics convention (blendedmvs/nsvf/tankstemple)
    'flip_x': False,            # co3d support
    'flip_y': False,            # co3d support
    'annot_path': '',           # co3d
    'split_path': '',           # co3d
    'sequence_name': '',        # co3d
    'load2gpu_on_the_fly': False,
    'testskip': 1,              # subsample testset
    'white_bkgd': False,
    'half_res': False,
    # forward-facing llff settings
    'ndc': False,
    'spherify': False,
    'factor': 4,
    'width': None,
    'height': None,
    'llffhold': 8,
    'load_depths': False,
}

# ------------------------------------------------------------- training
coarse_train = {
    'N_iters': 5000,
    'N_rand': 8192,
    'lrate_density': 1e-1,
    'lrate_k0': 1e-1,
    'lrate_rgbnet': 1e-3,
    'lrate_decay': 20,              # decay by 0.1 every lrate_decay*1000 steps
    'pervoxel_lr': True,            # view-count-based lr
    'pervoxel_lr_downrate': 1,
    'ray_sampler': 'random',        # random | flatten | in_maskcache
    'weight_main': 1.0,
    'weight_entropy_last': 0.01,
    'weight_rgbper': 0.1,
    'tv_every': 1,
    'tv_after': 0,
    'tv_before': 0,
    'tv_dense_before': 0,
    'weight_tv_density': 0.0,
    'weight_tv_k0': 0.0,
    'pg_scale': [],
    'skip_zero_grad_fields': [],
}

fine_train = dict(coarse_train, **{
    'N_iters': 20000,
    'pervoxel_lr': False,
    'ray_sampler': 'in_maskcache',
    'weight_entropy_last': 0.001,
    'weight_rgbper': 0.01,
    'pg_scale': [1000, 2000, 3000, 4000],
    'skip_zero_grad_fields': ['density', 'k0'],
})

# --------------------------------------------------- model and rendering
coarse_model_and_render = {
    'num_voxels': 1024000,
    'num_voxels_base': 1024000,
    'mpi_depth': 128,               # planes in the MPI grid (ndc=True)
    'nearest': False,
    'pre_act_density': False,
    'in_act_density': False,
    'bbox_thres': 1e-3,
    'mask_cache_thres': 1e-3,
    'rgbnet_dim': 0,
    'rgbnet_full_implicit': False,
    'implicit_voxel_feat': False,
    'feat_unfold': True,
    'cell_decode': True,
    'local_ensemble': True,
    'posbase_pe': 0,
    'rgbnet_direct': True,
    'rgbnet_depth': 3,
    'rgbnet_width': 128,
    'alpha_init': 1e-6,
    'fast_color_thres': 1e-7,
    'maskout_near_cam_vox': True,
    'world_bound_scale': 1,
    'stepsize': 0.5,
    # --- TPU-specific static-capacity knobs (see models/dvgo.py) ---
    'k_density': None,              # occupied-sample capacity per ray (None=dense)
    'k_color': 0,                   # top-k-by-weight capacity before the MLP
    # Grid dims rounded to a multiple of 8 (reference truncates exactly,
    # lib/dvgo.py:155-165). The fine bbox jitters a few voxels run-to-run,
    # so at quantum 1 every run's pg stages hit fresh XLA program shapes
    # and recompile (13-22 s per stage measured); quantized dims let the
    # persistent compile cache carry across runs. <=3% voxel-size change.
    'world_size_quantum': 8,
}

fine_model_and_render = dict(coarse_model_and_render, **{
    'num_voxels': 160 ** 3,
    'num_voxels_base': 160 ** 3,
    'rgbnet_dim': 12,
    'alpha_init': 1e-2,
    'fast_color_thres': 1e-4,
    'maskout_near_cam_vox': False,
    'world_bound_scale': 1.05,
    'use_coarse_geo': True,
    'k_density': 256,
    'k_color': 64,
    # Station budget for the sweep-path color MLP (top-K by weight; the
    # static-shape analogue of the reference's fast_color_thres pruning,
    # lib/dvgo.py:478-494). Gated to sweeps > 96 stations, so it only
    # kicks in at near-full grid resolution where geometry has converged.
    'sweep_color_topk': 48,
})
