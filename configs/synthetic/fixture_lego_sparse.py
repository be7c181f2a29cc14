# The lego-occupancy twin of fixture_lego_r3: same schedule and scale, but
# the 'lego' teacher variant (compact sharp primitives in ~55% of the
# extent) gives the coarse-geometry bbox and occupancy mask the statistics
# of the reference's headline scene — the clip/window machinery engages
# e2e the way it does on real lego, instead of the adversarial
# full-volume blobs.
_base_ = './fixture_lego.py'

expname = 'fixture_lego_sparse'

data = {'fixture_kwargs': {
    'H': 400, 'W': 400, 'n_train': 40, 'n_val': 2, 'n_test': 4,
    'teacher_res': 128, 'variant': 'lego',
}}
