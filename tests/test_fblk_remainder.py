"""Engine-level coverage for the fblk remainder -> 2D composed-box route.

Round-4 finding (PERF_LOG): at the final pg stage the occupancy clip plan
is None (the fine grid IS the coarse bbox), so remainder tiles — those
whose per-cell support exceeds every kept fused class — trained through
FULL-GRID sweeps (~35-100 ms realized vs 13-19 ms for a (96,96) composed
box). The engine now re-buckets remainder rays through
ops/sweep.build_ray_segments_2d and draws them as composed-box windowed
steps. This test forces EVERY tile into the remainder
(``fused_tile_classes = 0``) so the new plumbing carries the whole fine
stage, and asserts the run still learns the scene and emits 2-tuple
window classes.
"""

import os
import types

import numpy as np

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.data.synthetic import make_synthetic_dataset
from directvoxgo_tpu.engine import checkpoint as ckpt_lib
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.models.dvgo import DirectVoxGO

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_remainder_routes_through_2d_windows(tmp_path, monkeypatch,
                                             capsys):
    monkeypatch.setenv("DVGO_FUSED_TRAIN", "force")
    cfg = Config.fromfile(os.path.join(REPO, "configs", "default.py"))
    cfg.expname = "fblk_remainder"
    cfg.basedir = str(tmp_path)
    cfg.data.dataset_type = "synthetic_fixture"
    cfg.data.white_bkgd = True
    cfg.coarse_train.N_iters = 120
    cfg.coarse_train.N_rand = 512
    cfg.coarse_train.lrate_density = 0.3
    cfg.fine_train.N_iters = 600
    cfg.fine_train.N_rand = 512
    cfg.fine_train.pg_scale = []
    # Single-step dispatch so windowed draws engage at this tiny grid,
    # and zero kept fused classes so every tile lands in the remainder.
    cfg.fine_train.steps_per_dispatch = 1
    cfg.fine_train.fused_tile_classes = 0
    # Window widths below the 32^3 grid extent so 2-tuple classes exist
    # at test scale (production default is (48, 64, 96)).
    cfg.fine_train.remainder2d_widths = (8, 16, 24)
    cfg.coarse_model_and_render.num_voxels = 24 ** 3
    cfg.coarse_model_and_render.num_voxels_base = 24 ** 3
    cfg.fine_model_and_render.num_voxels = 32 ** 3
    cfg.fine_model_and_render.num_voxels_base = 32 ** 3
    cfg.fine_model_and_render.rgbnet_dim = 6
    cfg.fine_model_and_render.rgbnet_width = 32
    # 80^2 views: the maskcache-filtered fine pool must keep every
    # per-axis, per-direction-sign sub-pool >= one 512-ray tile, or the
    # tile build skips the axis outright.
    data_dict = make_synthetic_dataset(n_train=10, n_val=1, n_test=2,
                                       H=80, W=80)
    args = types.SimpleNamespace(seed=777, no_reload=False,
                                 no_reload_optimizer=False, ft_path="",
                                 i_print=100, i_weights=100000)
    train_lib.train(args, cfg, data_dict)
    out = capsys.readouterr().out

    # The fine stage's bucket histograms must contain 2-tuple (wu, wv)
    # remainder classes (the ('fblk', 0, 0, 0) key disappears when every
    # remainder ray classifies into a window).
    import re
    hist = [ln for ln in out.splitlines()
            if "(fine): [phase] segment classes" in ln]
    assert hist, f"fine-stage segment histogram expected; output:\n{out}"
    assert any(re.search(r" \((\d+), (\d+)\):", ln) for ln in hist), \
        f"2-tuple remainder window classes expected in: {hist}"

    ckpt = os.path.join(cfg.basedir, cfg.expname, "fine_last.tar")
    model = ckpt_lib.load_model(DirectVoxGO, ckpt)
    assert model is not None
