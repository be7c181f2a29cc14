_base_ = '../default.py'

# Full-length wall-clock measurement config: the exact lego training
# schedule (reference configs/nerf/lego.py = pure defaults: 5k-iter coarse +
# 20k-iter fine at 8192 rays, pg_scale [1k,2k,3k,4k], 160^3 final grid,
# in_maskcache sampling, mask renewals, pervoxel lr) on the hermetic
# procedural fixture at 400^2 so no external data is needed. Used to prove
# the BASELINE.md <=5 min target end-to-end (IMPROVING_LOG.md:40: the
# reference does lego coarse+fine in 3:58 on a V100).

expname = 'fixture_lego_r3'
basedir = './logs/synthetic'

data = {
    'datadir': None,
    'dataset_type': 'synthetic_fixture',
    'white_bkgd': True,
    'fixture_kwargs': {
        'H': 400, 'W': 400,
        'n_train': 40, 'n_val': 2, 'n_test': 4,
        'teacher_res': 128,
    },
}
