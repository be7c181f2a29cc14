# Coarse-stage dispatch probe (K=1 engine default at 106^3).
_base_ = './fixture_lego.py'
expname = 'fixture_lego_coarse_probe'
coarse_train = {'N_iters': 1500}
fine_train = {'N_iters': 0}
