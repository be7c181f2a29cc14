# Coarse-stage dispatch probe (forced K=8 step batching at 106^3).
_base_ = './fixture_lego_coarse_probe.py'
expname = 'fixture_lego_coarse_probe_k8'
coarse_train = {'steps_per_dispatch': 8}
