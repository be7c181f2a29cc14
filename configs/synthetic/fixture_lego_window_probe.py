# Window-engagement probe: short full-resolution fine stage (no pg_scale),
# long enough for the background-compiled window programs to land and be
# drawn — verifies the steady-state step rate run.py reaches.
_base_ = './fixture_lego.py'

expname = 'fixture_lego_window_probe'

coarse_train = {'N_iters': 1500}
fine_train = {'N_iters': 3000, 'pg_scale': []}
