"""End-to-end NDC/DMPIGO training on the forward-facing procedural fixture.

The LLFF-family analogue of test_train_e2e.py: trains the multiplane model
through the engine's sweep fast path (models/dmpigo.py forward_sweep — all
rays forced to the z axis) and asserts the test-view renders clearly beat
the trivial baseline. The all-black baseline on this fixture scores
16.6 dB; a 200-iter run reaches ~40 dB (the run that froze this bound also
exposed the saturated-alpha NaN fixed in ops/raymarch.py).
"""

import os

import numpy as np
import pytest

from directvoxgo_tpu.config import Config
from directvoxgo_tpu.data.load_data import load_everything
from directvoxgo_tpu.engine import checkpoint as ckpt_lib
from directvoxgo_tpu.engine import train as train_lib
from directvoxgo_tpu.engine.render import render_viewpoints
from directvoxgo_tpu.models.dmpigo import DirectMPIGO


class _Args:
    seed = 777
    no_reload = True
    no_reload_optimizer = True
    ft_path = ""
    i_print = 100
    i_weights = 100000
    data_parallel = False


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    cfg = Config.fromfile("configs/synthetic/fixture_ndc_tiny.py")
    cfg.basedir = str(tmp_path_factory.mktemp("ndc_e2e"))
    cfg.fine_train.N_iters = 200
    args = _Args()
    data_dict = load_everything(args=args, cfg=cfg)
    os.makedirs(os.path.join(cfg.basedir, cfg.expname), exist_ok=True)
    train_lib.train(args, cfg, data_dict)
    return cfg, data_dict


def test_ndc_training_learns_scene(trained):
    cfg, data_dict = trained
    ckpt = os.path.join(cfg.basedir, cfg.expname, "fine_last.tar")
    model = ckpt_lib.load_model(DirectMPIGO, ckpt)
    assert model.query_mode == "sweep"
    rk = {"near": data_dict["near"], "far": data_dict["far"], "bg": 0,
          "stepsize": cfg.fine_model_and_render.stepsize,
          "inverse_y": False}
    i_test = data_dict["i_test"]
    rgbs, depths, stats = render_viewpoints(
        model=model, render_poses=data_dict["poses"][i_test],
        HW=data_dict["HW"][i_test], Ks=data_dict["Ks"][i_test],
        ndc=True, render_kwargs=rk,
        gt_imgs=[data_dict["images"][i] for i in i_test],
        chunk=2048, verbose=False)
    psnr = float(np.mean(stats["psnr"]))
    print("ndc fixture e2e psnr:", psnr)
    # all-black baseline = 16.6 dB; a working run reaches ~40.
    assert psnr > 28.0, f"NDC fine-stage PSNR too low: {psnr}"
    assert np.isfinite(np.asarray(rgbs)).all()
    assert np.isfinite(np.asarray(depths)).all()
