# Setup-phase measurement probe: the full lego-scale data/model shapes but
# only a handful of train iters, so stage wall-clock ~= setup cost.
# (PERF_LOG round 3: the first full run had ~487 s of coarse-stage time
# outside the training loop.)
_base_ = './fixture_lego.py'

expname = 'fixture_lego_setup_probe'

coarse_train = {'N_iters': 20}
fine_train = {'N_iters': 20, 'pg_scale': []}
